"""Core engine: model manager, per-segment decoders, orchestration."""
