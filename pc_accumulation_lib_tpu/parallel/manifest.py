"""Resumable generation manifest.

The reference restarts from scratch after a crash (in-memory bev_idx
counters, run_kitti360_bev_gen.py:181-183; SURVEY.md section 5). Sharded
dataset-scale jobs need per-scene completion tracking: a JSON-lines manifest
records finished work units so a restarted job skips them.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional


class CompletionManifest:

    def __init__(self, path: str):
        self.path = path
        self._done: Dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self._done[rec['unit']] = rec

    def is_done(self, unit: str) -> bool:
        """True for units that completed WORK. Skip records (a run's
        attribute/idx filters excluded the unit) do not count: filters
        are per-run arguments, so a later run with different filters
        must re-evaluate the unit rather than find it 'done' forever."""
        rec = self._done.get(unit)
        return rec is not None and not rec.get('skipped')

    def get(self, unit: str) -> Optional[dict]:
        """Completion record for ``unit`` (None if pending). Runners use
        the recorded per-unit output counts to resume their sequential
        bev/subdir numbering exactly where the crashed job left off."""
        return self._done.get(unit)

    def mark_done(self, unit: str, **meta) -> None:
        rec = {'unit': unit, **meta}
        self._done[unit] = rec
        os.makedirs(os.path.dirname(self.path) or '.', exist_ok=True)
        with open(self.path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    def mark_skipped(self, unit: str, reason: str) -> None:
        """Record, for observability only, that this run's filters
        excluded ``unit``. The unit stays pending (see is_done); a
        repeat skip with the same reason is not re-appended."""
        prev = self._done.get(unit)
        if prev is not None and prev.get('skipped') == reason:
            return
        self.mark_done(unit, bevs=0, skipped=reason)

    def pending(self, units: Iterable[str]) -> List[str]:
        return [u for u in units if not self.is_done(u)]

    def stats(self) -> dict:
        return {'done': len(self._done)}


def shard_units(units: List[str], shard_idx: int, num_shards: int,
                manifest: Optional[CompletionManifest] = None) -> List[str]:
    """Deterministic strided unit shard for process ``shard_idx`` of
    ``num_shards`` (replaces manual --start_scene_idx/--end_scene_idx
    launches, run_nuscenes_bev_gen.py:44-45), minus completed units."""
    mine = [u for i, u in enumerate(units) if i % num_shards == shard_idx]
    if manifest is not None:
        mine = manifest.pending(mine)
    return mine
