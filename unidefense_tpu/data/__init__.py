from unidefense_tpu.data.datasets import LOADERS, get_dataset

__all__ = ["LOADERS", "get_dataset"]
