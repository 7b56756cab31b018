from .einsum_spec import (
    EinsumSpec,
    core_only_spec,
    siamese_spec,
    two_network_spec,
    with_inputs_spec,
)
from .contract import (
    contract_cores,
    make_core_only_fn,
    make_siamese_fn,
    make_two_network_fn,
    siamese_probability,
)
from .features import hermite_weights, hermite_phi, measurement_matrices, generate_data
from .scaling import Scaled, auto_scale, scaled_siamese_fn
from .mps_sweep import is_mps_chain, mps_sweep_siamese_fn

__all__ = [
    "EinsumSpec",
    "core_only_spec",
    "siamese_spec",
    "two_network_spec",
    "with_inputs_spec",
    "contract_cores",
    "make_core_only_fn",
    "make_siamese_fn",
    "make_two_network_fn",
    "siamese_probability",
    "hermite_weights",
    "hermite_phi",
    "measurement_matrices",
    "generate_data",
    "Scaled",
    "auto_scale",
    "scaled_siamese_fn",
    "is_mps_chain",
    "mps_sweep_siamese_fn",
]
