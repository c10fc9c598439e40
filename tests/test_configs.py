"""Config surface tests: all shipped YAMLs load and keep the reference's
training-recipe values (the 45-file config grid is part of the capability
surface, SURVEY §5.6)."""
import os

import pytest
import yaml

import conftest as cf

from cbim_tpu.config import load_config

CONFIG_ROOT = os.path.join(cf.REPO_ROOT, "configs")
SKIP_KEYS = {"world_size", "proc_idx", "rank", "port", "dist_url",
             "dist_backend", "multiprocessing_distributed", "data_root",
             # the reference hardcodes dead internal filesystem paths here;
             # we ship the key nulled (user points it at a local weight copy)
             "init_model"}


def _all_configs():
    for ds in sorted(os.listdir(CONFIG_ROOT)):
        for fn in sorted(os.listdir(os.path.join(CONFIG_ROOT, ds))):
            if fn.endswith(".yaml"):
                yield ds, fn


def test_all_configs_load():
    n = 0
    for ds, fn in _all_configs():
        model, dim = fn[:-5].rsplit("_", 1)
        cfg = load_config(ds, model, dim, config_root=CONFIG_ROOT)
        assert cfg.classes > 0 and cfg.base_lr > 0, (ds, fn)
        assert cfg.mesh_axes == ["data"], (ds, fn)
        n += 1
    assert n >= 45


@pytest.mark.skipif(not cf.has_reference(), reason="reference not mounted")
def test_config_values_match_reference():
    checked = 0
    for ds, fn in _all_configs():
        ref_path = os.path.join(cf.REFERENCE_ROOT, "config", ds, fn)
        if not os.path.exists(ref_path):
            continue
        model, dim = fn[:-5].rsplit("_", 1)
        cfg = load_config(ds, model, dim, config_root=CONFIG_ROOT)
        ref = yaml.safe_load(open(ref_path))
        for k, v in ref.items():
            if k in SKIP_KEYS:
                continue
            assert cfg.get(k) == v, (ds, fn, k, cfg.get(k), v)
            checked += 1
    assert checked > 500
