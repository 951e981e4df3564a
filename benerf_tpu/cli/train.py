"""Training CLI, flag-compatible with the reference:

    python -m benerf_tpu.cli.train --config configs/benerf_blender/tanabata.txt --index 0

(reference: python train.py --device N --config cfg.txt --index i,
README.md:91 — --device is accepted and ignored; device selection on TPU is
the mesh, see parallel/mesh.py and the mesh_devices flag.)
"""

from __future__ import annotations

from benerf_tpu.core.config import config_from_cli
from benerf_tpu.train.loop import train


def main(argv=None):
    cfg = config_from_cli(argv)
    print(f"[INFO] dataset={cfg.dataset} datadir={cfg.datadir} index={cfg.index}")
    train(cfg)


if __name__ == "__main__":
    main()
