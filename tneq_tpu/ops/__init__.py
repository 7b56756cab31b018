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
from .contract import make_siamese_env_fn
from .features import hermite_weights, hermite_phi, measurement_matrices, generate_data
from .scaling import Scaled, auto_scale, scaled_siamese_fn
from .mps_sweep import is_mps_chain, mps_sweep_siamese_fn
from .pairwise import log_abs_einsum, make_log_abs_overlap_fn
from .row_scan import make_row_scan_log_overlap_fn, supports_row_scan
from .complex_pair import (
    from_pair,
    make_pair_siamese_fn,
    pair_abs2,
    pair_tree,
    to_pair,
    unpair_tree,
)

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
    "make_siamese_env_fn",
    "log_abs_einsum",
    "make_log_abs_overlap_fn",
    "make_row_scan_log_overlap_fn",
    "supports_row_scan",
    "from_pair",
    "make_pair_siamese_fn",
    "pair_abs2",
    "pair_tree",
    "to_pair",
    "unpair_tree",
]
