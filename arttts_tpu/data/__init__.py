from arttts_tpu.data.filelist import parse_filelist
from arttts_tpu.data.batching import BucketBatcher, pad_batch

__all__ = ["parse_filelist", "BucketBatcher", "pad_batch"]
