"""Per-metric hierarchy parameters (``hta::Meta``).

Reference: /root/reference/include/hta/meta.hpp:41-54 (defaults),
/root/reference/src/meta.cpp:40-67 (validation),
/root/reference/include/hta/metric.hpp:74-92 (overflow-checked level walk).
"""

from __future__ import annotations

from dataclasses import dataclass

from .chrono import SECOND, YEAR
from .errors import MetaValidationError, ModeError

_INT64_MAX = (1 << 63) - 1

DEFAULT_INTERVAL_MIN = 10 * SECOND          # meta.hpp:43
DEFAULT_INTERVAL_MAX = YEAR                 # meta.hpp:44 (365 days)
DEFAULT_INTERVAL_FACTOR = 10                # meta.hpp:45


@dataclass(frozen=True)
class Meta:
    interval_min: int = DEFAULT_INTERVAL_MIN
    interval_max: int = DEFAULT_INTERVAL_MAX
    interval_factor: int = DEFAULT_INTERVAL_FACTOR
    mode: str = "RW"  # "R" | "W" | "RW" (src/mode.hpp:34-39)

    def __post_init__(self) -> None:
        if self.interval_factor <= 1:
            raise MetaValidationError(
                f"interval_factor must be > 1, got {self.interval_factor}")
        if self.interval_min <= 0:
            raise MetaValidationError(
                f"interval_min not positive: {self.interval_min}")
        if self.interval_min % self.interval_factor != 0:
            raise MetaValidationError(
                f"interval_min {self.interval_min} not divisible by "
                f"interval_factor {self.interval_factor}")
        if self.interval_max < self.interval_min:
            raise MetaValidationError(
                f"interval_max ({self.interval_max}) not larger than "
                f"interval_min ({self.interval_min})")
        if self.mode not in ("R", "W", "RW"):
            raise MetaValidationError(f"invalid mode {self.mode!r}")

    def level_intervals(self) -> list[int]:
        """All level intervals ``interval_min * factor^n <= interval_max``,
        with the reference's overflow check (metric.hpp:74-92)."""
        out: list[int] = []
        iv = self.interval_min
        while iv <= self.interval_max:
            out.append(iv)
            if iv > _INT64_MAX // self.interval_factor:
                break  # next multiply would overflow int64 — stop like the ref throws
            iv *= self.interval_factor
        return out

    # Mode enforcement (src/metric.cpp:73-95) -----------------------------
    def check_read(self) -> None:
        if "R" not in self.mode:
            raise ModeError("metric is not readable (mode W)")

    def check_write(self) -> None:
        if "W" not in self.mode:
            raise ModeError("metric is not writable (mode R)")
