"""Device peak-FLOPs lookup shared by trainer logging and benchmarks."""

from __future__ import annotations

from typing import Optional

# bf16 peak FLOP/s by device kind (public figures). Order matters: the
# "v5 lite"/"v5e" rows must match before the bare "v5" (v5p) row.
_PEAKS = [
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
]


def device_peak_flops(device) -> Optional[float]:
    kind = getattr(device, "device_kind", "").lower()
    return next((peak for sub, peak in _PEAKS if sub in kind), None)
