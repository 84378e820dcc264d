from .host_beam import HostCTCBeamDecoder, collapse_repeats  # noqa: F401
from .greedy import greedy_decode, ids_to_strings  # noqa: F401
