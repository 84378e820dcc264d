"""CLI arg wiring (reference main.py parity + extensions), without running
heavy training: dispatch targets are monkeypatched and call args asserted."""

import pytest

from pg_asr_tpu import cli


def test_parser_reference_flags_accepted():
    p = cli.build_parser()
    a = p.parse_args(["--mode", "train", "--corpus_path", "/c",
                      "--model_path", "/m", "--num_epochs", "3",
                      "--batch_size", "16", "--device", "0"])
    assert (a.mode, a.num_epochs, a.batch_size, a.device) == ("train", 3, 16, 0)


def test_parser_defaults_match_reference():
    a = cli.build_parser().parse_args(["--mode", "train"])
    assert a.num_epochs == 10   # reference main.py:22
    # reference main.py:23 default (32) is applied per-mode at dispatch
    # (train keeps 32 via TrainConfig; predict --decoder beam uses 128),
    # so the parser leaves it None for "not given"
    assert a.batch_size is None


def test_mode_required():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args([])


def test_train_dispatch_builds_config(monkeypatch):
    captured = {}

    def fake_train(corpus, model, config=None, **kwargs):
        captured.update(corpus=corpus, model=model, config=config,
                        profile_steps=kwargs.get("profile_steps", 0))

    import pg_asr_tpu.train as train_mod
    monkeypatch.setattr(train_mod, "train", fake_train)
    rc = cli.main(["--mode", "train", "--corpus_path", "/c", "--model_path",
                   "/m", "--num_epochs", "2", "--batch_size", "8",
                   "--model", "seq2seq", "--features", "mfcc",
                   "--learning_rate", "0.001", "--profile_steps", "3"])
    assert rc == 0
    cfg = captured["config"]
    assert cfg.train.num_epochs == 2
    assert cfg.train.batch_size == 8
    assert cfg.train.learning_rate == 0.001
    assert cfg.model.family == "seq2seq"
    assert cfg.features.kind == "mfcc"
    assert captured["profile_steps"] == 3


def test_predict_dispatch_defaults_paths(monkeypatch):
    captured = {}

    def fake_predict(test_path, aud_path, alphabet, model_path, **kw):
        captured.update(test_path=test_path, aud_path=aud_path,
                        alphabet=alphabet, model_path=model_path, **kw)

    import pg_asr_tpu.predict as predict_mod
    monkeypatch.setattr(predict_mod, "predict", fake_predict)
    rc = cli.main(["--mode", "predict", "--corpus_path", "/c",
                   "--model_path", "/m", "--decoder", "beam",
                   "--beam_size", "7"])
    assert rc == 0
    assert captured["test_path"] == "/c/test.tsv"
    assert captured["aud_path"] == "/c/clips"
    assert captured["alphabet"] == "/c/alphabet.txt"
    assert captured["decoder"] == "beam"
    assert captured["beam_size"] == 7
    # production default (r5): beam eval batches at 128 unless the user
    # sets --batch_size; greedy keeps 32 (next test)
    assert captured["batch_size"] == 128
    assert captured["beam_prune"] is None  # predict resolves config default


def test_predict_dispatch_batch_defaults_greedy(monkeypatch):
    captured = {}

    def fake_predict(test_path, aud_path, alphabet, model_path, **kw):
        captured.update(**kw)

    import pg_asr_tpu.predict as predict_mod
    monkeypatch.setattr(predict_mod, "predict", fake_predict)
    rc = cli.main(["--mode", "predict", "--corpus_path", "/c",
                   "--model_path", "/m"])
    assert rc == 0
    assert captured["batch_size"] == 32
    rc = cli.main(["--mode", "predict", "--corpus_path", "/c",
                   "--model_path", "/m", "--decoder", "beam",
                   "--batch_size", "16"])
    assert rc == 0
    assert captured["batch_size"] == 16  # explicit flag wins over the 128


def test_finetune_pg_dispatch(monkeypatch):
    captured = {}

    def fake_pg(corpus, model, num_steps=0, batch_size=None, config=None,
                eval_every=0):
        captured.update(corpus=corpus, num_steps=num_steps,
                        batch_size=batch_size, eval_every=eval_every)

    import pg_asr_tpu.rl.reinforce as rl_mod
    monkeypatch.setattr(rl_mod, "finetune_pg", fake_pg)
    rc = cli.main(["--mode", "finetune_pg", "--corpus_path", "/c",
                   "--model_path", "/m", "--pg_steps", "42",
                   "--batch_size", "4"])
    assert rc == 0
    assert captured["num_steps"] == 42
    assert captured["batch_size"] == 4


def test_finetune_pg_config_loads_saved_family(monkeypatch, tmp_path):
    """finetune_pg must start from the checkpoint's config.json (a default
    Config has the wrong family and the restore template would not match —
    regression: a conformer checkpoint crashed CLI finetune_pg)."""
    from pg_asr_tpu.config import Config, ConformerConfig, ModelConfig

    saved = Config(
        model=ModelConfig(family="conformer", vocab_size=8, input_dim=16),
        conformer=ConformerConfig(num_layers=2, d_model=32, num_heads=2,
                                  ffn_dim=64, subsample=2))
    (tmp_path / "config.json").write_text(saved.to_json())

    captured = {}

    def fake_pg(corpus, model, num_steps=0, batch_size=None, config=None,
                eval_every=0):
        captured["config"] = config

    import pg_asr_tpu.rl.reinforce as rl_mod
    monkeypatch.setattr(rl_mod, "finetune_pg", fake_pg)
    rc = cli.main(["--mode", "finetune_pg", "--corpus_path", "/c",
                   "--model_path", str(tmp_path), "--pg_steps", "1"])
    assert rc == 0
    assert captured["config"].model.family == "conformer"
    assert captured["config"].conformer == saved.conformer
