from .images import imread, imwrite, imwrite_instance_tiff, list_images

__all__ = ["imread", "imwrite", "imwrite_instance_tiff", "list_images"]
