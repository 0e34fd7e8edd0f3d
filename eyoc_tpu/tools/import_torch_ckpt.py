"""Import the reference's torch/MinkowskiEngine checkpoints.

The reference publishes pretrained weights (reference README.md:9) saved by
`_save_checkpoint` as `{epoch, state_dict, optimizer, scheduler, config,
best_val*}` (reference lib/trainer.py:166-179). `eyoc_tpu` param dicts were
designed to mirror the torch module names 1:1 (models/unet.py docstring), so
the mapping is mechanical:

    conv{l}.kernel            [K^3, Ci, Co]  -> params["conv{l}"]       (identity)
    conv{l}_tr.kernel         [K^3, Ci, Co]  -> params["conv{l}_tr"]
    conv1_tr.kernel           [Ci, Co] (k=1) -> params["conv1_tr"]      ([1, Ci, Co])
    final.kernel / final.bias                -> params["final"]["w"/"b"]
    norm*.bn.{weight,bias}                   -> params["norm*"]["scale"/"bias"]
    norm*.bn.running_{mean,var}              -> bn_state["norm*"] (BatchNormState)
    block*.{conv1,conv2}.kernel              -> params["block*"]["conv1"/"conv2"]
    block*.{norm1,norm2}.bn.*                -> params/bn_state["block*"]["norm*"]

Kernel tap order: MinkowskiEngine's HYPER_CUBE region iterator increments
the LAST coordinate axis first (z-fastest, x-slowest; both the v0.4
`region_iter.hpp` and v0.5 `kernel_region.hpp` carry-loops run from the last
axis toward the first). That is exactly the brick engine's `_off_index`
order (sparse/brick_conv.py:148-151), so kernels copy through with no
permutation. ME stores kernel_size=1 convolutions as 2-D [Ci, Co]; both
MinkowskiConvolution and MinkowskiConvolutionTranspose use the SAME
[K^3, Ci, Co] layout (the transpose is the adjoint with transposed kernel
maps, matching conv_up's `in[(v - off)/2] * W[off]` semantics). Conv bias
(only `final` in the reference models) is stored [1, out_channels] in ME
v0.5; import accepts that or flat [Co], export emits the ME shape.

The expected ME schema for ResUNetBN2C (key set + shapes) is hand-derived
from the reference source in tests/test_import_torch.py
(`resunetbn2c_expected_schema`) and both directions are checked against it
independently of this module's own round trip.

CLI:
    python -m eyoc_tpu.tools.import_torch_ckpt \
        --input /path/to/best_val_checkpoint.pth --output_dir runs/imported
writes `runs/imported/{checkpoint.msgpack, config.json}` loadable by
`--weights runs/imported/checkpoint`, `--resume_dir` test flows, and
`training.checkpoint.load_weights_only`.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import zipfile
from typing import Any, Dict, Tuple

import numpy as np

from eyoc_tpu.models import init_unet, load_model
from eyoc_tpu.sparse.norm import BatchNormState


# ----------------------------------------------------------- torch .pth I/O


def _torch_load(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint to host numpy. Uses torch when available;
    falls back to a minimal zipfile+pickle reader for the standard zip
    serialization format (torch >= 1.6) so the importer works in
    torch-free deployments."""
    try:
        import torch  # host-only dependency, optional

        obj = torch.load(path, map_location="cpu", weights_only=False)
        return obj
    except ImportError:
        return _torch_load_zip_no_torch(path)


class _TensorStub:
    def __init__(self, storage, storage_offset, size, stride):
        self.storage = storage
        self.storage_offset = storage_offset
        self.size = size
        self.stride = stride

    def numpy(self):
        arr = self.storage[self.storage_offset:]
        return np.lib.stride_tricks.as_strided(
            arr, shape=self.size,
            strides=[s * arr.itemsize for s in self.stride]).copy()


_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8, "BoolStorage": np.bool_,
}


def _torch_load_zip_no_torch(path: str) -> Dict[str, Any]:
    """Minimal reader for torch's zipfile format: data.pkl + per-storage
    binary blobs. Unknown classes (easydict config etc.) degrade to plain
    dicts/None rather than failing the weight import."""
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    prefix = names[0].split("/")[0]
    storages: Dict[str, np.ndarray] = {}

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name in (
                    "_rebuild_tensor_v2", "_rebuild_tensor"):
                def rebuild(storage, storage_offset, size, stride, *a):
                    return _TensorStub(storage, storage_offset, size, stride)
                return rebuild
            if module == "collections" and name == "OrderedDict":
                return dict
            if module == "torch" and name.endswith("Storage"):
                return _DTYPES[name]

            class _Any(dict):
                def __init__(self, *a, **k):
                    super().__init__()
            return _Any

        def persistent_load(self, pid):
            # ('storage', dtype, key, location, numel)
            _, dtype, key, _, numel = pid
            if key not in storages:
                raw = zf.read(f"{prefix}/data/{key}")
                storages[key] = np.frombuffer(raw, dtype=dtype, count=numel)
            return storages[key]

    with zf.open(f"{prefix}/data.pkl") as f:
        return Unpickler(f).load()


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, _TensorStub):
        return t.numpy()
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


# ------------------------------------------------------------- the mapping


class ImportError_(ValueError):
    pass


def _get(sd: Dict[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        raise ImportError_(f"torch state_dict is missing key {key!r}")
    return np.asarray(_to_numpy(sd[key]), np.float32)


def _conv_kernel(sd, key: str, template: np.ndarray) -> np.ndarray:
    w = _get(sd, key)
    if w.ndim == 2:  # ME stores kernel_size=1 convs as [Ci, Co]
        w = w[None]
    if w.shape != template.shape:
        raise ImportError_(
            f"{key}: torch kernel shape {w.shape} != expected {template.shape}")
    return w


def _norm_entries(sd, name: str, params_t, state_t):
    """Map one norm module. Returns (params, state) matching the templates."""
    base = f"{name}.bn" if f"{name}.bn.weight" in sd else name
    scale = _get(sd, f"{base}.weight").reshape(-1)
    bias = _get(sd, f"{base}.bias").reshape(-1)
    if scale.shape != np.shape(params_t["scale"]):
        raise ImportError_(
            f"{name}: channel mismatch {scale.shape} vs "
            f"{np.shape(params_t['scale'])}")
    p = {"scale": scale, "bias": bias}
    if state_t is None:  # instance norm: no running stats
        return p, None
    mean = _get(sd, f"{base}.running_mean")
    var = _get(sd, f"{base}.running_var")
    return p, BatchNormState(mean, var)


def torch_state_dict_to_params(
    sd: Dict[str, Any], params_template, bn_template
) -> Tuple[dict, dict]:
    """Map a reference model state_dict onto (params, bn_state) pytrees
    shaped like the templates (from `init_unet`)."""
    params: dict = {}
    bn: dict = {}
    for name, tmpl in params_template.items():
        if name == "final":
            # ME v0.5 MinkowskiConvolutionBase stores the bias as
            # [1, out_channels]; accept both that and a flat [out_channels]
            b = _get(sd, "final.bias").reshape(-1)
            if b.shape != np.shape(tmpl["b"]):
                raise ImportError_(
                    f"final.bias: {b.shape} != expected {np.shape(tmpl['b'])}")
            params["final"] = {
                "w": _conv_kernel(sd, "final.kernel", tmpl["w"][None])[0],
                "b": b,
            }
        elif name.startswith("conv"):
            params[name] = _conv_kernel(sd, f"{name}.kernel", np.asarray(tmpl))
        elif name.startswith("norm"):
            params[name], bn[name] = _norm_entries(
                sd, name, tmpl, bn_template.get(name))
        elif name.startswith("block"):
            bp: dict = {}
            bs: dict = {}
            st = bn_template.get(name) or {}
            for sub, sub_t in tmpl.items():
                if sub.startswith("conv"):
                    bp[sub] = _conv_kernel(
                        sd, f"{name}.{sub}.kernel", np.asarray(sub_t))
                else:
                    bp[sub], bs[sub] = _norm_entries(
                        sd, f"{name}.{sub}", sub_t, st.get(sub))
            params[name] = bp
            bn[name] = bs
        else:  # pragma: no cover - init_unet only emits the above
            raise ImportError_(f"unmapped template entry {name!r}")
    return params, bn


def params_to_torch_state_dict(params, bn_state) -> Dict[str, np.ndarray]:
    """Inverse mapping (numpy arrays keyed by torch module names) — used by
    the round-trip tests and as an export path back to the reference."""
    sd: Dict[str, np.ndarray] = {}

    def put_norm(name, p, s):
        sd[f"{name}.bn.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bn.bias"] = np.asarray(p["bias"])
        if s is not None:
            sd[f"{name}.bn.running_mean"] = np.asarray(s.mean)
            sd[f"{name}.bn.running_var"] = np.asarray(s.var)
            sd[f"{name}.bn.num_batches_tracked"] = np.asarray(0, np.int64)

    for name, val in params.items():
        if name == "final":
            sd["final.kernel"] = np.asarray(val["w"])
            # ME v0.5 bias layout is [1, out_channels]
            sd["final.bias"] = np.asarray(val["b"]).reshape(1, -1)
        elif name.startswith("conv"):
            w = np.asarray(val)
            sd[f"{name}.kernel"] = w[0] if w.shape[0] == 1 else w
        elif name.startswith("norm"):
            put_norm(name, val, bn_state.get(name))
        elif name.startswith("block"):
            st = bn_state.get(name) or {}
            for sub, sub_v in val.items():
                if sub.startswith("conv"):
                    sd[f"{name}.{sub}.kernel"] = np.asarray(sub_v)
                else:
                    put_norm(f"{name}.{sub}", sub_v, st.get(sub))
    return sd


# ------------------------------------------------------------------- driver


def import_checkpoint(
    input_path: str,
    model: str | None = None,
    model_n_out: int | None = None,
    conv1_kernel_size: int | None = None,
):
    """Returns (params, bn_state, info dict). Model hyperparameters default
    to the checkpoint's embedded config (reference saves the full config,
    lib/trainer.py:170-176)."""
    obj = _torch_load(input_path)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    cfg = obj.get("config", {}) if isinstance(obj, dict) else {}
    getcfg = (cfg.get if isinstance(cfg, dict)
              else lambda k, d=None: getattr(cfg, k, d))
    model = model or getcfg("model", "ResUNetBN2C")
    model_n_out = model_n_out or int(getcfg("model_n_out", 32))
    conv1_kernel_size = conv1_kernel_size or int(getcfg("conv1_kernel_size", 5))

    spec = load_model(model)
    import jax

    tp, tb = init_unet(spec, jax.random.PRNGKey(0), 1, model_n_out,
                       conv1_kernel_size)
    tp = jax.tree_util.tree_map(np.asarray, tp)
    tb = jax.tree_util.tree_map(np.asarray, tb)
    params, bn = torch_state_dict_to_params(sd, tp, tb)
    info = {
        "model": model,
        "model_n_out": model_n_out,
        "conv1_kernel_size": conv1_kernel_size,
        "epoch": int(obj.get("epoch", -1)) if isinstance(obj, dict) else -1,
        "source": os.path.abspath(input_path),
    }
    return params, bn, info


def save_imported(out_dir: str, name: str, params, bn, info):
    """Write `load_weights_only`-compatible {name}.msgpack (+ json meta)."""
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    payload = {"params": params, "bn_state": bn}
    path = os.path.join(out_dir, f"{name}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump({"epoch": info.get("epoch", -1), "imported_from":
                   info.get("source", ""), "config": {
                       "model": info["model"],
                       "model_n_out": info["model_n_out"],
                       "conv1_kernel_size": info["conv1_kernel_size"]}},
                  f, indent=2)
    return path


def write_test_config(out_dir: str, input_path: str, info):
    """Write a `cli.test`-loadable config.json next to the imported weights.

    Flag surface = our parser defaults, overlaid with every key of the
    torch checkpoint's embedded config that our parser also knows (the
    reference dumps its full argparse config into the checkpoint,
    lib/trainer.py:170-176, and the flag names match ours by design), then
    the resolved model hyperparameters. After this, the imported directory
    is a drop-in `--save_dir`/OUT_DIR for cli.test / scripts/test_kitti.sh
    (see docs/REAL_DATA_RUNBOOK.md).
    """
    from eyoc_tpu.config import Config, build_parser

    cfg = Config(vars(build_parser().parse_args([])))
    obj = _torch_load(input_path)
    embedded = obj.get("config", {}) if isinstance(obj, dict) else {}
    if not isinstance(embedded, dict):  # easydict pickles as dict subclass
        embedded = dict(embedded.__dict__) if hasattr(embedded, "__dict__") else {}
    for k, v in embedded.items():
        if k in cfg and isinstance(v, (bool, int, float, str, type(None))):
            cfg[k] = v
    cfg.update({k: info[k]
                for k in ("model", "model_n_out", "conv1_kernel_size")})
    cfg.out_dir = out_dir
    path = os.path.join(out_dir, "config.json")
    cfg.save(path)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True, help="torch .pth checkpoint")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--name", default="checkpoint",
                   help="output basename (use best_val_checkpoint to feed "
                        "cli.test directly)")
    p.add_argument("--model", default=None,
                   help="override the checkpoint's embedded config")
    p.add_argument("--model_n_out", default=None, type=int)
    p.add_argument("--conv1_kernel_size", default=None, type=int)
    p.add_argument("--write_test_config", action="store_true",
                   help="also write config.json so --output_dir is a "
                        "drop-in --save_dir for cli.test")
    args = p.parse_args(argv)
    params, bn, info = import_checkpoint(
        args.input, args.model, args.model_n_out, args.conv1_kernel_size)
    path = save_imported(args.output_dir, args.name, params, bn, info)
    if args.write_test_config:
        cfg_path = write_test_config(args.output_dir, args.input, info)
        print(f"wrote {cfg_path}")
    n = sum(int(np.prod(np.shape(x)))
            for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"imported {info['model']} ({n:,} params, epoch {info['epoch']}) "
          f"-> {path}")


if __name__ == "__main__":
    # host-only tool: never claim (or block on) the TPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
