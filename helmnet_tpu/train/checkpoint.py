"""Checkpointing: orbax-backed native checkpoints + importer for the
reference PyTorch-Lightning checkpoint (trained_models/*.ckpt).

The torch checkpoint stores 93 tensors under names like
`f.enc.0.conv_signal.double_conv.0.weight` (NCHW/OIHW); we map them onto the
functional params pytree (NHWC/HWIO) — see models/blocks.py converters.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, ModelConfig
from ..models.blocks import torch_conv_to_hwio, torch_convtranspose_to_hwio


def _load_torch_state_dict(path: str) -> tuple[dict, dict]:
    """Load a lightning checkpoint's state_dict + hyper_parameters via torch.

    Shims pytorch_lightning's AttributeDict if lightning isn't installed.
    """
    import sys
    import types

    import torch

    if "pytorch_lightning" not in sys.modules:
        try:
            import pytorch_lightning  # noqa: F401
        except ImportError:
            m = types.ModuleType("pytorch_lightning")
            u = types.ModuleType("pytorch_lightning.utilities")
            p = types.ModuleType("pytorch_lightning.utilities.parsing")

            class AttributeDict(dict):
                def __getattr__(self, k):
                    return self[k]

            p.AttributeDict = AttributeDict
            m.utilities = u
            u.parsing = p
            sys.modules["pytorch_lightning"] = m
            sys.modules["pytorch_lightning.utilities"] = u
            sys.modules["pytorch_lightning.utilities.parsing"] = p

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    hparams = dict(ckpt.get("hyper_parameters", {}))
    return sd, hparams


def _double_conv_from_torch(sd: dict, prefix: str) -> dict:
    out = {
        "c1": {
            "w": torch_conv_to_hwio(sd[f"{prefix}.double_conv.0.weight"]),
            "b": sd[f"{prefix}.double_conv.0.bias"],
        },
        "c2": {
            "w": torch_conv_to_hwio(sd[f"{prefix}.double_conv.2.weight"]),
            "b": sd[f"{prefix}.double_conv.2.bias"],
        },
    }
    # activation between the convs: PReLU stores a learnable slope at .1
    act_key = f"{prefix}.double_conv.1.weight"
    out["act"] = {"a": sd[act_key]} if act_key in sd else {}
    return out


def params_from_torch_state_dict(sd: dict, cfg: ModelConfig) -> dict:
    """Map the reference `f.*` tensors to our params pytree (numpy arrays)."""
    params: dict[str, Any] = {
        "inc": _double_conv_from_torch(sd, "f.inc"),
        "enc": [],
        "decode": [],
        "up": [],
        "outc": {
            "w": torch_conv_to_hwio(sd["f.outc.conv.weight"]),
            "b": sd["f.outc.conv.bias"],
        },
    }
    for d in range(cfg.depth):
        blk = {
            "conv_signal": _double_conv_from_torch(sd, f"f.enc.{d}.conv_signal"),
            "down": {
                "w": torch_conv_to_hwio(sd[f"f.enc.{d}.down.weight"]),
                "b": sd[f"f.enc.{d}.down.bias"],
            },
        }
        if f"f.enc.{d}.conv_state.double_conv.0.weight" in sd:
            blk["conv_state"] = _double_conv_from_torch(sd, f"f.enc.{d}.conv_state")
        params["enc"].append(blk)
    for i in range(cfg.depth + 1):
        params["decode"].append(_double_conv_from_torch(sd, f"f.decode.{i}"))
    for d in range(cfg.depth):
        params["up"].append(
            {
                "w": torch_convtranspose_to_hwio(sd[f"f.up.{d}.weight"]),
                "b": sd[f"f.up.{d}.bias"],
            }
        )
    return jax.tree.map(lambda a: jnp.asarray(np.ascontiguousarray(a)), params)


def load_reference_checkpoint(path: str) -> Tuple[dict, Config]:
    """Import the reference .ckpt -> (params pytree, Config).

    Mirrors IterativeSolver.load_from_checkpoint(strict=False): buffers that
    don't match (source, Lap.*) are ignored — we rebuild them from config.
    """
    sd, hp = _load_torch_state_dict(path)
    cfg = Config()
    cfg = cfg.replace(
        max_iterations=int(hp.get("max_iterations", cfg.max_iterations)),
        geometry=cfg.geometry.__class__(
            domain_size=int(hp.get("domain_size", 96)),
            pml_size=int(hp.get("PMLsize", 8)),
            sigma_max=float(hp.get("sigma_max", 2.0)),
        ),
        model=cfg.model.__class__(
            architecture=hp.get("architecture", "custom_unet"),
            activation_function=hp.get("activation_function", "prelu"),
            features=int(hp.get("features", 8)),
            depth=int(hp.get("depth", 4)),
            state_depth=int(hp.get("state_depth", 4)),
            state_channels=int(hp.get("state_channels", 2)),
        ),
        source=cfg.source.__class__(
            amplitude=float(hp.get("source_amplitude", 10.0)),
            location=tuple(hp.get("source_location", (82, 48))),
            omega=float(hp.get("omega", 1.0)),
            phase=float(hp.get("source_phase", 0.0)),
            smoothing=bool(hp.get("source_smoothing", False)),
        ),
    )
    params = params_from_torch_state_dict(sd, cfg.model)
    return params, cfg


# ---------------------------------------------------------------------------
# Native checkpoints (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str, step: int, state) -> None:
    """Save a train-state pytree with orbax.

    Multi-host: every process calls this with its (replicated or sharded)
    global arrays; orbax coordinates the distributed write. `directory`
    must be on a filesystem all hosts can reach.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(directory: str, step: int, template, sharded=False):
    """Restore into `template`'s structure.

    sharded=True: template leaves must be jax.Arrays carrying the TARGET
    shardings (e.g. replicated over a multi-host mesh, or data-sharded);
    orbax restores each leaf directly onto those shardings — the multi-host
    resume path (no host-side gather)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        if sharded:
            from orbax.checkpoint import checkpoint_utils

            restore_args = checkpoint_utils.construct_restore_args(template)
            return ckptr.restore(path, item=template, restore_args=restore_args)
        try:
            return ckptr.restore(path, item=template)
        except ValueError:
            # checkpoints written from a MESH trainer carry shardings that
            # the plain restore refuses to deserialize without a concrete
            # target; restore onto the template's (e.g. single-device)
            # shardings instead — evaluating a domain-partitioned run's
            # checkpoint on one device is the normal eval path.
            from orbax.checkpoint import checkpoint_utils

            tpl = jax.tree.map(
                lambda a: (jnp.asarray(a) if not isinstance(a, jax.Array)
                           else a),
                template,
            )
            restore_args = checkpoint_utils.construct_restore_args(tpl)
            return ckptr.restore(path, item=tpl, restore_args=restore_args)


def _manifest_path(directory: str) -> str:
    return os.path.join(directory, "manifest.json")


def _load_manifest(directory: str) -> dict:
    import json

    path = _manifest_path(directory)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"scores": {}, "last": None, "scheduler": {}}


def _write_manifest(directory: str, manifest: dict) -> None:
    import json

    with open(_manifest_path(directory), "w") as f:
        json.dump(manifest, f, indent=1)


def update_topk(
    directory: str,
    step: int,
    val_loss: float,
    state,
    k: int = 3,
    extra: dict | None = None,
) -> None:
    """ModelCheckpoint(save_top_k=k, monitor='val_loss', save_last=True)
    semantics (reference train.py:90-97): save this step, keep the k best
    steps by val_loss plus the most recent one, delete the rest.

    `extra` (JSON-serializable, e.g. plateau-scheduler state) is recorded in
    the manifest per step so multi-segment runs resume the LR schedule.
    """
    import math
    import shutil

    save_checkpoint(directory, step, state)
    manifest = _load_manifest(directory)
    score = float(val_loss)
    if not math.isfinite(score):
        score = float("1e30")  # divergent val: eligible for pruning, not top-k
    manifest["scores"][str(step)] = score
    manifest["last"] = step
    if extra is not None:
        manifest.setdefault("scheduler", {})[str(step)] = extra
    ranked = sorted(manifest["scores"].items(), key=lambda kv: kv[1])
    keep = {int(s) for s, _ in ranked[:k]} | {step}
    for name in os.listdir(directory):
        if not name.startswith("step_"):
            continue
        try:
            s = int(name.split("_", 1)[1])
        except ValueError:
            continue
        if s not in keep and str(s) in manifest["scores"]:
            shutil.rmtree(os.path.join(directory, name), ignore_errors=True)
    manifest["scores"] = {
        s: v for s, v in manifest["scores"].items() if int(s) in keep
    }
    manifest["scheduler"] = {
        s: v
        for s, v in manifest.get("scheduler", {}).items()
        if int(s) in keep
    }
    _write_manifest(directory, manifest)


def best_step(directory: str):
    """Step with the lowest recorded val_loss (restore-best for eval)."""
    manifest = _load_manifest(directory)
    if not manifest["scores"]:
        return None
    return int(min(manifest["scores"].items(), key=lambda kv: kv[1])[0])


def manifest_extra(directory: str, step: int) -> dict | None:
    return _load_manifest(directory).get("scheduler", {}).get(str(step))


def latest_step(directory: str):
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def save_params_npz(path: str, params) -> None:
    """Portable flat-npz export of a params pytree (leaves in tree order)."""
    flat, _ = jax.tree_util.tree_flatten(params)
    np.savez_compressed(path, **{f"p{i}": np.asarray(a) for i, a in enumerate(flat)})


def load_params_npz(path: str, cfg: Config):
    """Load a flat-npz params export back into the architecture's pytree."""
    from ..models.registry import get_architecture

    arch = get_architecture(cfg.model.architecture)
    template = arch.init_params(jax.random.PRNGKey(0), cfg.model)
    flat, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as f:
        leaves = [jnp.asarray(f[f"p{i}"]) for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
