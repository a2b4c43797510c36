"""Real-world dataset loaders (FROSTT sparse tensors)."""
from tt_sketch_tpu.data.frostt import (
    FROSTT_TENSORS,
    load_frostt,
    parse_tns,
    sample_error,
)

__all__ = ["FROSTT_TENSORS", "load_frostt", "parse_tns", "sample_error"]
