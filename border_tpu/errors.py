"""Unified error surface.

≙ border-core's LrrError (border-core/src/error.rs:1-14: RecordKeyError /
RecordValueTypeError) extended with the framework-specific failure kinds —
one importable hierarchy so callers can catch ``BorderTpuError`` for any
framework-raised condition, or the specific subclass.
"""

from __future__ import annotations


class BorderTpuError(Exception):
    """Base class for every error this framework raises."""


class RecordKeyError(BorderTpuError, KeyError):
    """A Record was asked for a key it does not hold
    (≙ LrrError::RecordKeyError, error.rs:5-8)."""

    def __init__(self, key: str):
        super().__init__(key)
        self.key = key

    def __str__(self) -> str:
        return f"Record has no key {self.key!r}"


class RecordValueTypeError(BorderTpuError, TypeError):
    """A Record value was accessed with the wrong typed getter
    (≙ LrrError::RecordValueTypeError, error.rs:9-12)."""

    def __init__(self, key: str, expected: str, actual: str):
        super().__init__(key, expected, actual)
        self.key = key
        self.expected = expected
        self.actual = actual

    def __str__(self) -> str:
        return (
            f"Record key {self.key!r} is not a {self.expected} "
            f"(got {self.actual})"
        )


class ConfigError(BorderTpuError, ValueError):
    """Invalid component configuration (YAML construction, registry
    lookups — ≙ the serde/Configurable error paths, policy.rs:100-140)."""


class EnvironmentError_(BorderTpuError, RuntimeError):
    """Environment construction/step failure (native pool, registry)."""
