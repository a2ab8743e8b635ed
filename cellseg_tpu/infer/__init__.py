from .sliding_window import sliding_window_inference, tile_origins

__all__ = ["sliding_window_inference", "tile_origins"]
