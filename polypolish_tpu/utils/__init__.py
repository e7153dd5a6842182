from polypolish_tpu.utils.rounding import bankers_rounding, bankers_rounding_vec
from polypolish_tpu.utils.revcomp import reverse_complement
from polypolish_tpu.utils.timing import format_duration

__all__ = [
    "bankers_rounding",
    "bankers_rounding_vec",
    "reverse_complement",
    "format_duration",
]
