"""The runnable examples stay runnable (README "Examples" section).

Each main() is driven at a tiny config on the test process's virtual CPU
mesh — these are the same entry points the README advertises, so a
refactor that breaks them fails here instead of in a user's shell.
"""

import numpy as np


def test_train_ppo_smoke():
    from examples.train_ppo import main

    params = main(scenario="dispersion", num_envs=8, iters=2, horizon=4,
                  virtual_devices=0, seed=0)
    flat = np.concatenate([
        np.ravel(np.asarray(l))
        for l in __import__("jax").tree_util.tree_leaves(params)
    ])
    assert np.isfinite(flat).all()


def test_train_sharded_smoke():
    from examples.train_sharded import main

    main(scenario="dispersion", num_envs=8, iters=2, horizon=2,
         virtual_devices=0)


def test_use_env_example_importable():
    import examples.run_heuristic  # noqa: F401
    import examples.speed_sweep  # noqa: F401
    import examples.use_vmas_tpu_env  # noqa: F401
