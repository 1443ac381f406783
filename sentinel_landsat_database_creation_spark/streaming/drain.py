"""Checkpoint placement for one-shot availableNow verification drains.

The fixed cost of a drain is not data volume but the state-store + WAL
round-trips per micro-batch, each fsync'd to the checkpoint location. A
batch-shaped drain whose sink is an in-memory table gains nothing from a
durable checkpoint, so these land on tmpfs (/dev/shm) when present.
A REAL deployment must keep checkpoints on durable shared storage —
this module is only for the verification drains.
"""

from __future__ import annotations

import os
import tempfile


def drain_checkpoint_dir(name: str) -> str:
    """Per-query checkpoint dir on the fastest ephemeral filesystem.
    Callers remove it after the drain (shutil.rmtree, ignore_errors)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, "slc_drain_ckpt", name)
