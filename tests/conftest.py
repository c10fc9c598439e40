"""Test env: force an 8-device virtual CPU mesh before jax is imported.

This is the TPU-native analogue of "no real cluster needed" (SURVEY.md §4):
all sharding/collective tests run on a host-platform device mesh.
"""
import os
import sys

# NOTE: the environment may pre-set JAX_PLATFORMS (e.g. to a remote TPU
# platform); tests must run on the local virtual CPU mesh, so override it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # belt and braces vs env overrides

# persistent compilation cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The PyTorch reference implementation, used as the golden oracle for parity
# tests (never imported by the framework itself).
REFERENCE_ROOT = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _stub_reference_deps()


def _stub_reference_deps():
    """Stub packages the reference imports but this image lacks (timm, monai).

    Only the handful of symbols the reference's module-level imports touch are
    provided; tests that would exercise deeper functionality skip instead.
    """
    import types
    if "timm" not in sys.modules:
        import torch
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                return tensor.normal_(mean, std).clamp_(a, b)

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        def to_3tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)

        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.to_3tuple = to_3tuple
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "batchgenerators" not in sys.modules:
        bg = types.ModuleType("batchgenerators")
        bga = types.ModuleType("batchgenerators.augmentations")
        bgu = types.ModuleType("batchgenerators.augmentations.utils")
        bgu.pad_nd_image = lambda *a, **k: a[0]
        bga.utils = bgu
        bg.augmentations = bga
        sys.modules["batchgenerators"] = bg
        sys.modules["batchgenerators.augmentations"] = bga
        sys.modules["batchgenerators.augmentations.utils"] = bgu

    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        runner = types.ModuleType("mmcv.runner")
        runner.load_checkpoint = lambda *a, **k: None
        mmcv.runner = runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = runner

    if "monai" not in sys.modules:
        # functional torch implementations of the MONAI blocks the reference
        # imports (tests/monai_stub.py) — UNETR and the vendored SwinUNETR
        # run as real forward-parity oracles.
        import torch
        import monai_stub

        monai = types.ModuleType("monai")
        networks = types.ModuleType("monai.networks")
        blocks = types.ModuleType("monai.networks.blocks")
        dynunet_block = types.ModuleType("monai.networks.blocks.dynunet_block")
        nets = types.ModuleType("monai.networks.nets")
        mlayers = types.ModuleType("monai.networks.layers")
        mutils = types.ModuleType("monai.utils")

        for mod, names in [
            (blocks, ["UnetrBasicBlock", "UnetrPrUpBlock", "UnetrUpBlock",
                      "MLPBlock", "PatchEmbed", "UnetOutBlock"]),
            (dynunet_block, ["UnetOutBlock"]),
            (nets, ["ViT"]),
            (mlayers, ["DropPath"]),
        ]:
            for n in names:
                setattr(mod, n, getattr(monai_stub, n))

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                return tensor.normal_(mean, std).clamp_(a, b)

        mlayers.trunc_normal_ = trunc_normal_

        def ensure_tuple_rep(v, n):
            return v if isinstance(v, (tuple, list)) else (v,) * n

        def look_up_option(opt, supported):
            # monai.utils.look_up_option: dict-like supported maps key->value
            if isinstance(supported, dict):
                return supported[opt]
            return opt

        def optional_import(*a, **k):
            try:
                import importlib
                mod = importlib.import_module(a[0])
                if "name" in k:
                    return getattr(mod, k["name"]), True
                return mod, True
            except ImportError:
                return None, False

        mutils.ensure_tuple_rep = ensure_tuple_rep
        mutils.look_up_option = look_up_option
        mutils.optional_import = optional_import

        blocks.dynunet_block = dynunet_block
        networks.blocks = blocks
        networks.nets = nets
        networks.layers = mlayers
        monai.networks = networks
        monai.utils = mutils
        for k, v in [("monai", monai), ("monai.networks", networks),
                     ("monai.networks.blocks", blocks),
                     ("monai.networks.blocks.dynunet_block", dynunet_block),
                     ("monai.networks.nets", nets),
                     ("monai.networks.layers", mlayers),
                     ("monai.utils", mutils)]:
            sys.modules[k] = v
