from unidefense_tpu.models.registry import MODEL, load_model

__all__ = ["MODEL", "load_model"]
