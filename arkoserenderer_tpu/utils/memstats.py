"""Device memory (HBM) statistics + rolling history.

Role-equivalent to the reference's VRAM budget polling + history UI
(VulkanBackend.cpp:2025-2076 with VK_EXT_memory_budget, GpuScene's VramStats
usage): polls the JAX device memory stats and keeps a rolling window for
observability surfaces.
"""

from __future__ import annotations

import collections
import dataclasses

import jax


@dataclasses.dataclass
class MemSnapshot:
    bytes_in_use: int
    bytes_limit: int
    peak_bytes_in_use: int

    @property
    def used_fraction(self) -> float:
        return self.bytes_in_use / self.bytes_limit if self.bytes_limit else 0.0


def snapshot(device=None) -> MemSnapshot:
    d = device or jax.devices()[0]
    stats = d.memory_stats() or {}
    return MemSnapshot(
        bytes_in_use=stats.get("bytes_in_use", 0),
        bytes_limit=stats.get("bytes_limit", stats.get("bytes_reservable_limit", 0)),
        peak_bytes_in_use=stats.get("peak_bytes_in_use", 0),
    )


class MemHistory:
    """Rolling memory usage history (the VRAM plot's data source)."""

    def __init__(self, window: int = 120):
        self._hist: collections.deque[MemSnapshot] = collections.deque(maxlen=window)

    def poll(self, device=None) -> MemSnapshot:
        s = snapshot(device)
        self._hist.append(s)
        return s

    def history_mb(self) -> list[float]:
        return [s.bytes_in_use / 1e6 for s in self._hist]

    def format(self) -> str:
        if not self._hist:
            return "no samples"
        s = self._hist[-1]
        return (
            f"HBM {s.bytes_in_use / 1e6:.1f} / {s.bytes_limit / 1e6:.1f} MB "
            f"({s.used_fraction * 100:.1f}%), peak {s.peak_bytes_in_use / 1e6:.1f} MB"
        )
