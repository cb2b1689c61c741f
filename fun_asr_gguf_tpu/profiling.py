"""Profiling / tracing hooks.

The reference's tracing is hand-rolled perf_counter spans into ``Timings``
(``nano_dataclass.py:73-101``) — preserved throughout core/. This module
adds the TPU-native layer on top: an optional XLA profiler trace around any
engine call, producing a TensorBoard-loadable trace of device kernels.

    from fun_asr_gguf_tpu.profiling import device_trace
    with device_trace("/tmp/asr_trace"):
        engine.transcribe("a.wav")
"""

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler.trace wrapper; a no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class SpanTimer:
    """Lightweight named-span collector (host-side)."""

    def __init__(self):
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + \
                time.perf_counter() - t0

    def report(self) -> str:
        return "\n".join(f"  {name:<20} {secs*1000:8.2f} ms"
                         for name, secs in sorted(self.spans.items()))
