from .threeclass import decode_interior_prob, decode_interior_prob_host
from .distance import decode_distance, foi_correction
from .flow import decode_flow

__all__ = [
    "decode_interior_prob",
    "decode_interior_prob_host",
    "decode_distance",
    "foi_correction",
    "decode_flow",
]
