"""Reference-CLI-parity entry point (reference main.py): routes
train / predict / preproc (+ finetune_pg) to the pg_asr_tpu drivers."""

from pg_asr_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
