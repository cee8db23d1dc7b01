"""NuScenes oracle-pose BEV generation (run_nuscenes_oracle_bev_gen.py
counterpart). The reference script is a stale variant of
run_nuscenes_bev_gen.py (its dataloader call signature predates the
NuScenes-object API, reference run_nuscenes_oracle_bev_gen.py:174-180);
here it simply forces the oracle path of the corrected superset."""
from __future__ import annotations

from pc_accumulation_lib_tpu.runners import nuscenes_bev_gen


def main(argv=None):
    argv = list(argv) if argv is not None else None
    if argv is None:
        import sys
        argv = sys.argv[1:]
    if '--use_oracle_pose' not in argv:
        argv.append('--use_oracle_pose')
    nuscenes_bev_gen.main(argv)


if __name__ == '__main__':
    main()
