class _Missing:
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision stub")

def __getattr__(name):  # any transform class resolves to the guard
    return _Missing
