"""Public facade (placeholder — full engine lands with the core layer)."""


class FunASREngine:  # pragma: no cover - replaced by the real engine
    def __init__(self, *a, **k):
        raise NotImplementedError("engine core not built yet")


def create_asr_engine(*a, **k):  # pragma: no cover
    raise NotImplementedError("engine core not built yet")
