"""Public utility helpers (reference vmas/simulator/utils.py module-level
functions and TorchUtils statics not covered elsewhere)."""

import numpy as np
import jax.numpy as jnp

from vmas_tpu.core.utils import JaxUtils
from vmas_tpu.utils import extract_nested_with_index, x_to_rgb_colormap
from vmas_tpu.render.interactive import InteractiveEnv


def test_extract_nested_with_index():
    data = {
        "a": jnp.arange(6.0).reshape(3, 2),
        "b": {"c": jnp.arange(3.0)},
    }
    out = extract_nested_with_index(data, 1)
    assert np.allclose(out["a"], [2.0, 3.0])
    assert float(out["b"]["c"]) == 1.0
    # bare arrays index directly
    assert np.allclose(extract_nested_with_index(jnp.arange(4.0), 2), 2.0)


def test_x_to_rgb_colormap():
    """Endpoints land exactly on the resampled colormap entries, midpoints
    interpolate, and the alpha column is constant (reference
    utils.py:127-152)."""
    from matplotlib import colormaps

    x = np.array([0.0, 0.5, 1.0])
    out = x_to_rgb_colormap(x, low=0.0, high=1.0, alpha=0.25, cmap_res=10)
    assert out.shape == (3, 4)
    table = colormaps["viridis"].resampled(10)(range(10))[:, :-1]
    assert np.allclose(out[0, :3], table[0])
    assert np.allclose(out[2, :3], table[9])
    assert np.all(out[:, 3] == 0.25)
    # x = 0.5 maps to position 4.5: the mean of entries 4 and 5
    assert np.allclose(out[1, :3], 0.5 * (table[4] + table[5]))
    # a constant field (high - low < 1e-5) stays on the low entry
    flat = x_to_rgb_colormap(np.zeros(2), cmap_res=10)
    assert np.allclose(flat[:, :3], table[0])


def test_recursive_clone_structure():
    inner = {"x": jnp.ones(3)}
    tree = {"a": inner, "b": jnp.zeros(2)}
    out = JaxUtils.recursive_clone(tree)
    assert out is not tree and out["a"] is not inner  # fresh containers
    assert out["a"]["x"] is inner["x"]  # immutable leaves pass through
    assert set(out) == {"a", "b"}


def test_format_obs():
    o = InteractiveEnv.format_obs(jnp.array([0.123, -4.567]))
    assert o == [0.12, -4.57]
    nested = InteractiveEnv.format_obs({"p": jnp.array([1.005])})
    assert nested == {"p": [1.0]}
