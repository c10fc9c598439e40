"""Cross-framework eval parity: the reference's TRAINED fold-0 nnFormer
(EMA weights, epoch 100) transplanted into our Flax model + sliding-window
engine + device metrics, evaluated on the same fold-0 test volumes.

Reference's own eval of these weights: Dice 0.7297 (ref_fold0_eval_log).
If our inference stack reproduces that from the same weights, the full
inference path (engine fusion, metrics) matches at deployment scale.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import torch

from cbim_tpu.config import load_config
from cbim_tpu.data import get_dataset
from cbim_tpu.models import get_model
from cbim_tpu.training.validation import validate
from cbim_tpu.utils.torch_import import import_for_model

cfg = load_config(dataset="acdc", model="nnformer", dimension="3d",
                  yaml_path="/tmp/parity_nnf/config/acdc/nnformer_3d.yaml")
cfg.data_root = "/tmp/parity_nnf/data"

testset = get_dataset(cfg, mode="test", fold_idx=0)
print("test volumes:", len(testset), flush=True)

import jax
import jax.numpy as jnp
model = get_model(cfg)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, *cfg.training_size, 1)), train=False)
print("init done", flush=True)

ck = torch.load("/tmp/parity_nnf/exp_ref/acdc/parity_ref/fold_0_best.pth",
                map_location="cpu", weights_only=False)
new_vars = import_for_model(cfg, ck["ema_model_state_dict"], dict(variables))
variables = {"params": new_vars["params"], **{k: v for k, v in new_vars.items()
                                              if k not in ("params",)}}
print("transplant done", flush=True)

dice, asd, hd = validate(model, variables, testset, cfg,
                         compute_distance=False)
print("per-class dice:", np.round(np.asarray(dice), 4), flush=True)
print("mean dice: %.4f (reference's own eval of the same weights: 0.7297)"
      % float(np.mean(dice)), flush=True)
