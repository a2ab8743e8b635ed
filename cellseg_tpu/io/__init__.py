from .images import imread, imwrite, imwrite_instance_tiff, list_images, to_hwc3

__all__ = ["imread", "imwrite", "imwrite_instance_tiff", "list_images",
           "to_hwc3"]
