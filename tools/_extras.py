"""Shared atomic recorder for R2_TPU_EXTRAS.json capability artifacts.

Tools run under external `timeout`; a SIGTERM landing mid json.dump must
not truncate the file and lose previously recorded results, so every write
goes to a tmp file followed by os.replace (the same pattern as
Trainer3D.save_state).
"""

import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..")
EXTRAS = os.path.join(ROOT, "R2_TPU_EXTRAS.json")


def record(key, value, path=None):
    path = path or EXTRAS
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[key] = value
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, path)
    print(f"recorded {key}", flush=True)
