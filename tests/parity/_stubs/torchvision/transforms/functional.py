class InterpolationMode:
    BICUBIC = "bicubic"
    BILINEAR = "bilinear"
    NEAREST = "nearest"

def __getattr__(name):
    def _missing(*a, **k):
        raise NotImplementedError("torchvision stub")
    return _missing
