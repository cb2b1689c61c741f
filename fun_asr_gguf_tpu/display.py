"""Async console display (reference ``fun_asr_gguf/display.py``).

A background printer thread fed by a queue decouples transcription from
terminal IO. Supports streamed token output, ``[i/N]`` segment prefixes and
a ``skip_technical`` filter used by the long-audio path.
"""

import queue
import sys
import threading


class DisplayReporter:
    """Aggregates messages and prints them from a background thread."""

    def __init__(self, verbose: bool = True, on_stream=None,
                 on_stream_reset=None):
        self.verbose = verbose
        self.on_stream = on_stream      # callback(piece) for token streaming
        self.on_stream_reset = on_stream_reset   # callback() on retry
        self.message_queue = queue.Queue()
        self.stop_event = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.current_segment = (0, 0)   # (idx, total)
        self.skip_technical = False
        self.thread.start()

    def print(self, message: str, force: bool = False):
        if not self.verbose:
            return
        # Capture the segment prefix at call time so async printing can't lag it.
        prefix = ""
        if self.current_segment[1] > 1 and self.current_segment[0] > 0:
            prefix = f"[{self.current_segment[0]}/{self.current_segment[1]}] "
        if force or not self.skip_technical:
            self.message_queue.put(("print", (prefix, message)))

    def stream(self, chunk: str):
        if self.on_stream is not None:
            self.on_stream(chunk)
        if self.verbose:
            self.message_queue.put(("stream", chunk))

    def stream_reset(self):
        """Signal that previously streamed pieces are being discarded
        (repetition-fuse retry): SSE consumers should clear their buffer.
        Console output already prints the retry banner."""
        if self.on_stream_reset is not None:
            self.on_stream_reset()

    def set_segment(self, current: int, total: int):
        self.current_segment = (current, total)

    def _run(self):
        last_was_stream = False
        while not (self.stop_event.is_set() and self.message_queue.empty()):
            try:
                msg_type, content = self.message_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if msg_type == "print":
                if last_was_stream:
                    sys.stdout.write("\n")
                    last_was_stream = False
                prefix, message = content
                sys.stdout.write(f"{prefix}{message}\n")
            else:  # stream
                sys.stdout.write(content)
                last_was_stream = True
            sys.stdout.flush()
            self.message_queue.task_done()

    def stop(self):
        if self.thread.is_alive():
            self.stop_event.set()
            self.thread.join(timeout=1.0)
            sys.stdout.write("\n")
            sys.stdout.flush()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stop()
