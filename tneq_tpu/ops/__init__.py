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
]
