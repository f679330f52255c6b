def __getattr__(name):
    def _missing(*a, **k):
        raise NotImplementedError("flash_attn stub")
    return _missing
