"""Run-scoped scratch directories (staging relations, throwaway
checkpoints, test sinks).

RAM-backed scratch (/dev/shm) when available, system tmp otherwise: the
consumers are all WITHIN-RUN artifacts — staged narrow relations that are
read back seconds later, availableNow checkpoint protocols, memory-sink
spill — where fsync latency is pure overhead (~25% of a small stream
query's wall time on this VM). Anything that must survive a process
(durable checkpoints, real sink output) takes an explicit caller-chosen
path instead; the restart-safety paths are tested with on-disk dirs in
tests/test_streaming.py.

On a cluster the analogue is executor local SSD / instance store for
shuffle+staging and durable shared storage for checkpoints — the split
is the same, only the mount points change.
"""

from __future__ import annotations

import os
import tempfile


def scratch_dir(prefix: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)
