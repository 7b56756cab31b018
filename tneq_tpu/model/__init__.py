from .qctn import QCTN

__all__ = ["QCTN"]
