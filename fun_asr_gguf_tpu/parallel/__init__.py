"""Parallelism: device meshes, parameter shardings, multi-chip programs.

The reference is strictly single-process/single-context (SURVEY.md §2.7);
this layer is new TPU-idiomatic design: batch/data parallelism across
segments and streams, tensor parallelism for the LLM via NamedSharding +
jit (XLA inserts the collectives over ICI), and a full fine-tuning step
(CTC + LM losses) sharded dp×tp.
"""

from .mesh import make_mesh  # noqa: F401
from .sharding import (llm_param_sharding, shard_llm_params)  # noqa: F401
