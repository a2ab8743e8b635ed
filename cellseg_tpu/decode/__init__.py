from .threeclass import decode_interior_prob, decode_interior_prob_host

__all__ = ["decode_interior_prob", "decode_interior_prob_host"]
