"""Host utilities: RNG key derivation, PPM I/O, OBJ ingestion, dtypes."""
from . import dtypes, obj, ppm, rng
