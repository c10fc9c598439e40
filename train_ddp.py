#!/usr/bin/env python
"""Compatibility entry point for users of the reference's train_ddp.py.

There is no separate distributed launcher in this framework: train.py runs
the SAME program single-chip or data-parallel over a GSPMD device mesh
(multi-host pods initialize automatically; see cbim_tpu/parallel/mesh.py).
This shim simply forwards to train.py.
"""

from train import main

if __name__ == "__main__":
    print("note: train_ddp.py is an alias — GSPMD data parallelism is "
          "built into train.py (no mp.spawn / NCCL launcher needed)")
    main()
