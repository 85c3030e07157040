from unidefense_tpu.engines.base import AbstractEngine
from unidefense_tpu.engines.forgery import ForgeryEngine
from unidefense_tpu.engines.ocim import OCIMEngine
from unidefense_tpu.engines.uniattack import UniAttackEngine

ENGINE = {
    "FE": ForgeryEngine,
    "OCIM": OCIMEngine,
    "UE": UniAttackEngine,
}


def get_engine(name: str = "FE"):
    """Engine registry (engine/__init__.py:6-14 parity)."""
    if name not in ENGINE:
        raise KeyError(f"Engine '{name}' not found; available: {sorted(ENGINE)}")
    return ENGINE[name]


__all__ = ["AbstractEngine", "ForgeryEngine", "OCIMEngine", "UniAttackEngine", "ENGINE", "get_engine"]
