from .processor import ImageProcessor, load_image  # noqa: F401
