"""Architecture registry (reference IterativeSolver.init_f, hybridnet.py:77-90).

Each architecture is a namespace exposing the functional model contract:
  init_params(key, cfg)                 -> params pytree
  init_states(batch, domain, cfg)       -> tuple of state arrays
  apply(params, x, states, cfg=cfg)     -> (out[B,H,W,2], new_states)
  flatten_states(states)                -> [B, C, S]
  unflatten_states(flat, domain, cfg)   -> tuple of state arrays
  total_state_length(domain, cfg)       -> S
"""

from __future__ import annotations

from . import hybridnet, resnet

ARCHITECTURES = {
    "custom_unet": hybridnet,
    "resnet": resnet,
}


def get_architecture(name: str):
    try:
        return ARCHITECTURES[name]
    except KeyError:
        raise NotImplementedError(f"Unknown architecture {name}") from None
