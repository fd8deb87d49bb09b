"""checkify NaN/OOB debug guards (SURVEY.md §5; tracer.utils.debug)."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from tracer.api import get_scene
from tracer.render.whitted import WhittedConfig, render_image
from tracer.utils.config import load_config
from tracer.utils.debug import checked


def test_clean_render_passes_checks():
    scene, cam = get_scene(load_config("cornell256", height=16, width=16))
    run = checked(lambda s, c: render_image(
        s, c, 16, 16, WhittedConfig(max_bounces=1)))
    img = np.asarray(run(scene, cam))
    assert np.isfinite(img).all()


def test_nan_input_is_caught():
    import dataclasses as dc

    scene, cam = get_scene(load_config("cornell256", height=8, width=8))
    bad = dc.replace(scene, verts=scene.verts.at[0, 0].set(jnp.nan))
    run = checked(lambda s, c: render_image(
        s, c, 8, 8, WhittedConfig(max_bounces=1)))
    with pytest.raises(checkify.JaxRuntimeError):
        run(bad, cam)
