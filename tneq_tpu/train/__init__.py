from .losses import fidelity, fidelity_loss, nll_loss
from .fit import make_masked_fidelity_fit, identity_cores, FitResult

__all__ = [
    "fidelity",
    "fidelity_loss",
    "nll_loss",
    "make_masked_fidelity_fit",
    "identity_cores",
    "FitResult",
]
