def is_initialized():
    return False

def get_rank():
    return 0

def get_world_size():
    return 1

def __getattr__(name):
    def _missing(*a, **k):
        raise NotImplementedError("deepspeed stub")
    return _missing
