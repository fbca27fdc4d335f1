"""Generate golden test data from the PyTorch reference at /root/reference.

The reference package's top-level __init__ needs gym/pyglet (absent here), so
we register stub packages pointing at the reference source tree and import the
physics modules directly. The reference is used ONLY as a numerical oracle:
inputs are random, outputs are recorded to .npz files consumed by the test
suite (fixed-seed parity harness, SURVEY.md section 4 / BASELINE.json).

Run manually:  python tests/golden/gen_reference_oracle.py
"""

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "data")


def bootstrap_reference():
    """Make `vmas.simulator.*` importable without running vmas/__init__.py."""
    if "vmas" in sys.modules:
        return
    pkg = types.ModuleType("vmas")
    pkg.__path__ = [os.path.join(REF, "vmas")]
    sys.modules["vmas"] = pkg
    sub = types.ModuleType("vmas.simulator")
    sub.__path__ = [os.path.join(REF, "vmas", "simulator")]
    sys.modules["vmas.simulator"] = sub
    pkg.simulator = sub  # joints.py references vmas.simulator.utils attribute-style

    # The reference's Color enum has a duplicate YELLOW member, which Python
    # 3.12's enum rejects. Pre-load a patched copy of vmas.simulator.utils.
    utils_path = os.path.join(REF, "vmas", "simulator", "utils.py")
    with open(utils_path) as f:
        src = f.read()
    src = src.replace("YELLOW = (0.75, 0.75, 0.25)", "YELLOW_LEGACY = (0.75, 0.75, 0.25)", 1)
    utils_mod = types.ModuleType("vmas.simulator.utils")
    utils_mod.__file__ = utils_path
    sys.modules["vmas.simulator.utils"] = utils_mod
    exec(compile(src, utils_path, "exec"), utils_mod.__dict__)
    sub.utils = utils_mod

    # Some scenarios (painting, football) import vmas.simulator.rendering at
    # module level, which needs pyglet (absent). Recording never renders, so
    # stub the module with attribute dummies.
    rendering_mod = types.ModuleType("vmas.simulator.rendering")
    rendering_mod.__getattr__ = lambda name: type(name, (), {})
    sys.modules["vmas.simulator.rendering"] = rendering_mod
    sub.rendering = rendering_mod


def gen_geometry(seed=0, n=4096):
    import torch

    bootstrap_reference()
    from vmas.simulator import physics as P

    torch.manual_seed(seed)
    g = torch.Generator().manual_seed(seed)

    def rnd(*shape, lo=-2.0, hi=2.0):
        return (torch.rand(*shape, generator=g) * (hi - lo) + lo).to(torch.float32)

    data = {}

    # closest_point_line
    lp, lr, ll, tp = rnd(n, 2), rnd(n, 1), rnd(n, lo=0.05, hi=1.5), rnd(n, 2)
    out = P._get_closest_point_line(lp, lr, ll, tp)
    data.update(cpl_line_pos=lp, cpl_line_rot=lr, cpl_line_len=ll, cpl_point=tp, cpl_out=out)

    # closest_points_line_line
    l2p, l2r, l2l = rnd(n, 2), rnd(n, 1), rnd(n, lo=0.05, hi=1.5)
    o1, o2 = P._get_closest_points_line_line(lp, lr, ll, l2p, l2r, l2l)
    data.update(cll_l2_pos=l2p, cll_l2_rot=l2r, cll_l2_len=l2l, cll_out1=o1, cll_out2=o2)

    # closest_point_box
    bp, br = rnd(n, 2), rnd(n, 1)
    bw, bl = rnd(n, lo=0.05, hi=1.0), rnd(n, lo=0.05, hi=1.0)
    o = P._get_closest_point_box(bp, br, bw, bl, tp)
    data.update(cpb_box_pos=bp, cpb_box_rot=br, cpb_box_w=bw, cpb_box_l=bl, cpb_out=o)

    # closest_line_box
    o1, o2 = P._get_closest_line_box(bp, br, bw, bl, lp, lr, ll)
    data.update(clb_out1=o1, clb_out2=o2)

    # closest_box_box
    b2p, b2r = rnd(n, 2), rnd(n, 1)
    b2w, b2l = rnd(n, lo=0.05, hi=1.0), rnd(n, lo=0.05, hi=1.0)
    o1, o2 = P._get_closest_box_box(bp, br, bw, bl, b2p, b2r, b2w, b2l)
    data.update(cbb_b2_pos=b2p, cbb_b2_rot=b2r, cbb_b2_w=b2w, cbb_b2_l=b2l, cbb_out1=o1, cbb_out2=o2)

    # inner_point_box
    o, d = P._get_inner_point_box(tp, o1, bp)
    data.update(ipb_outside=tp, ipb_surface=o1, ipb_box_pos=bp, ipb_out=o, ipb_dist=d)

    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT, "geometry.npz"),
        **{k: v.numpy() for k, v in data.items()},
    )
    print("wrote geometry.npz:", len(data), "arrays of n =", n)


if __name__ == "__main__":
    gen_geometry()


def gen_raycasts(seed=3, n=512):
    """Golden data for the batched ray-cast kernels (reference core.py:1280-1625)."""
    import torch

    bootstrap_reference()
    from vmas.simulator.core import Agent, Box, Landmark, Line, Sphere, World

    g = torch.Generator().manual_seed(seed)

    def rnd(*shape, lo=-1.0, hi=1.0):
        return (torch.rand(*shape, generator=g) * (hi - lo) + lo).to(torch.float32)

    B = n
    w = World(B, "cpu")
    w.add_agent(Agent("a0", shape=Sphere(0.05)))
    w.add_landmark(Landmark("box", shape=Box(length=0.4, width=0.2)))
    w.add_landmark(Landmark("sph", shape=Sphere(0.25)))
    w.add_landmark(Landmark("lin", shape=Line(length=0.7)))
    for i, e in enumerate(w.entities):
        e.state.pos = rnd(B, 2)
        e.state.rot = rnd(B, 1, lo=-3.14, hi=3.14)

    agent = w.agents[0]
    R = 16
    angles = rnd(B, R, lo=-3.14, hi=3.14)
    dist = w.cast_rays(agent, angles, max_range=2.0, entity_filter=lambda e: True)

    data = {
        "pos": torch.stack([e.state.pos for e in w.entities], 1).numpy(),
        "rot": torch.stack([e.state.rot[:, 0] for e in w.entities], 1).numpy(),
        "angles": angles.numpy(),
        "dist": dist.numpy(),
    }
    np.savez_compressed(os.path.join(OUT, "raycast.npz"), **data)
    print("wrote raycast.npz", dist.shape)
