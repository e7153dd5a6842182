from polypolish_tpu.pipeline.polish import polish
from polypolish_tpu.pipeline.filtering import filter_pairs

__all__ = ["polish", "filter_pairs"]
