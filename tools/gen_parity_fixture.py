"""Generate the torch-free parity fixture (VERDICT r3 #6).

Runs the torch reference trunk (tests/test_torch_parity.py's TTrunk — the
checkpoint-layout mirror) once on fixed inputs and records:
  - the checkpoint-naming state dict (so the fixture is self-contained),
  - the input images,
  - the trunk outputs (pts/conf/desc/desc_conf, both views).

tests/test_checkpoint_fixture.py then asserts OUR converted model matches
these activations WITHOUT torch installed — the converter/model gate runs
in every environment.

Run (needs torch): python tools/gen_parity_fixture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from test_torch_parity import CFG, H, W, TTrunk, _sane_state_dict, \
        _torch_pos

    sd = _sane_state_dict()
    tmodel = TTrunk(CFG)
    tmodel.load_state_dict(sd)
    tmodel.eval()

    rng = np.random.default_rng(7)
    img1 = rng.uniform(-1, 1, size=(2, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, size=(2, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        _, _, _, _, want = tmodel(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)), _torch_pos())

    out = {"img1": img1, "img2": img2}
    for k, v in want.items():
        out[f"out_{k}"] = v.numpy()
    for k, v in sd.items():
        out[f"sd_{k}"] = v.numpy()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "mast3r_tiny_parity.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)/1e6:.2f} MB, "
          f"{len(out)} arrays)")


if __name__ == "__main__":
    main()
