"""Metrics / observability (SURVEY.md F3, §5.5).

Counters and gauges for the decode/play pipelines. The aggregate
realtime factor (the north-star metric) is derived from samples_out
against wall-clock spans recorded with `span()`.
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class Metrics:
    frames_ok: int = 0
    frames_error: int = 0
    resyncs: int = 0
    granules_decoded: int = 0
    granules_muted: int = 0
    samples_out: int = 0
    underruns: int = 0
    overruns: int = 0
    seeks: int = 0
    streams_active: int = 0
    streams_finished: int = 0
    host_seconds: float = 0.0
    device_seconds: float = 0.0
    _spans: dict = field(default_factory=dict)

    def span(self, name: str):
        return _Span(self, name)

    def realtime_factor(self, sample_rate: int) -> float:
        wall = self.host_seconds + self.device_seconds
        if wall <= 0:
            return 0.0
        return self.samples_out / sample_rate / wall

    def merge(self, other: "Metrics") -> "Metrics":
        """Accumulate another Metrics into this one (multi-track
        sessions: the queue's totals are the sum over its players).
        Extra span-derived `*_seconds` attrs are summed too."""
        for k, v in other.__dict__.items():
            if k.startswith("_") or not isinstance(v, (int, float)):
                continue
            setattr(self, k, getattr(self, k, 0) + v)
        return self

    def to_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}

    def log_line(self) -> str:
        return json.dumps({"mp3tpu_metrics": self.to_dict()})


class _Span:
    def __init__(self, m: Metrics, name: str):
        self.m, self.name = m, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        key = f"{self.name}_seconds"
        setattr(self.m, key, getattr(self.m, key, 0.0) + dt)
        return False
