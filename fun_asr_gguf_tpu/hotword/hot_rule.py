# coding: utf-8
"""Regex rule-based correction.

Behavioral port of the reference RuleCorrector
(``fun_asr_gguf/hotword/hot_rule.py``): "pattern = replacement" lines,
thread-safe updates, invalid patterns skipped silently. Provided for API
parity (like the reference, the engine path does not wire it in by
default). ``correct`` is an alias of ``substitute`` — the reference's
``__main__`` calls a ``correct`` API that its class never defines.
"""

import re
from threading import Lock
from typing import Dict


class RuleCorrector:
    """Exact regex substitution rules."""

    def __init__(self):
        self.patterns: Dict[str, str] = {}
        self._lock = Lock()

    def update_rules(self, rule_text: str) -> int:
        new_patterns = {}
        for line in rule_text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" = ")
            if len(parts) == 2:
                new_patterns[parts[0].strip()] = parts[1].strip()
        with self._lock:
            self.patterns = new_patterns
        return len(new_patterns)

    def substitute(self, text: str) -> str:
        if not text or not self.patterns:
            return text
        with self._lock:
            patterns = dict(self.patterns)
        result = text
        for pattern, replacement in patterns.items():
            try:
                result = re.sub(pattern, replacement, result)
            except re.error:
                pass
        return result

    correct = substitute
