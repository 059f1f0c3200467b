"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

The reference had no test suite (SURVEY.md section 4); this pyramid uses
the fake multi-device CPU backend the reference never had.
"""

import os
import sys

# Force CPU: the ambient environment pre-sets JAX_PLATFORMS to the TPU
# tunnel ('axon'), whose default matmul precision is bf16 — unusable for
# bit-parity unit tests. Benchmarks run on the real chip via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The config route works even if jax was already imported by a plugin or
# sitecustomize, as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent XLA compilation cache: this box has ONE CPU core, so compiles
# dominate suite wall time; caching makes repeat runs start warm (works on
# the CPU backend too — verified). CLI subprocesses spawned by e2e tests
# share the same cache via enable_compilation_cache() in each entry point.
from dino_video_summarization_transformer_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()



def cpu_subprocess_env(**extra):
    """Env for CLI subprocesses that must run on the CPU backend.

    JAX_PLATFORMS=cpu alone is NOT enough: the axon sitecustomize registers
    the TPU PJRT plugin whenever PALLAS_AXON_POOL_IPS is set, and a CLI
    subprocess then chats with the TPU tunnel — measured 5.5 min vs 52 s
    for one tiny train_ssl run. Scrub the pool vars like __graft_entry__'s
    dryrun bootstrap does.
    """
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    # drop this conftest's 8-virtual-device flag: CLI smoke tests exercise
    # the single-device path (their tiny batches aren't divisible by 8);
    # the multi-device mesh is covered by test_sharding / dryrun_multichip
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _stub_module(name):
    import importlib.machinery
    import types

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m

def add_reference_path():
    """Make the read-only reference importable as a parity oracle.

    The reference's models/__init__.py imports its Swin transformer, which
    needs `timm` (absent here); stub the two symbols it uses.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "datasets_custom" not in sys.modules:
        # bare package shell: the real __init__ imports torchvision-dependent
        # modules; submodules like datasets_custom.data_utils are importable
        # directly once __path__ points at the reference dir
        import types

        pkg = _stub_module("datasets_custom")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "datasets_custom")]
        sys.modules["datasets_custom"] = pkg
    if "fvcore" not in sys.modules:
        import types

        fv = _stub_module("fvcore")
        fvc = _stub_module("fvcore.common")
        fvf = _stub_module("fvcore.common.file_io")
        fvf.PathManager = object
        fv.common = fvc
        fvc.file_io = fvf
        sys.modules.update({"fvcore": fv, "fvcore.common": fvc,
                            "fvcore.common.file_io": fvf})
    if "torchvision" not in sys.modules:
        import types

        tv = _stub_module("torchvision")
        tvio = _stub_module("torchvision.io")
        tvu = _stub_module("torchvision.utils")
        tvt = _stub_module("torchvision.transforms")
        tvtf = _stub_module("torchvision.transforms.functional")
        tvio.read_video = None
        tvu.save_image = None
        tv.io, tv.utils, tv.transforms = tvio, tvu, tvt
        tvt.functional = tvtf
        sys.modules.update({
            "torchvision": tv, "torchvision.io": tvio,
            "torchvision.utils": tvu, "torchvision.transforms": tvt,
            "torchvision.transforms.functional": tvtf,
        })
    if "timm" not in sys.modules:
        import types

        import torch
        import torch.nn as nn

        def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        class _DropPath(nn.Identity):
            def __init__(self, drop_prob=None):
                super().__init__()

        import importlib.machinery

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        # transformers probes timm via importlib.util.find_spec; a stub with
        # __spec__ = None makes that raise ValueError
        for m in (timm, timm_models, timm_layers):
            m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
        timm.__version__ = "0.0-stub"
        timm_layers.DropPath = _DropPath
        timm_layers.trunc_normal_ = _trunc_normal_
        timm_layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
