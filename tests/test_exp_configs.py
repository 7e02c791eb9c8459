"""Every shipped experiment config must build and run a tiny query.

Catches conf-tree/model-factory mismatches (missing keys, bad includes,
unsupported combinations) for all of conf/exp/*.conf — the reference has
no such check and broken configs only surface at train time.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.pixelnerf import make_model
from pixelnerf_tpu.render.renderer import RendererConfig, render_rays
from pixelnerf_tpu.utils import hocon

pytestmark = pytest.mark.slow  # full build+render per config (~1 min total)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFS = sorted(glob.glob(os.path.join(_ROOT, "conf", "exp", "*.conf")))


@pytest.mark.parametrize("conf_path", CONFS, ids=[os.path.basename(c) for c in CONFS])
def test_config_builds_and_renders(conf_path):
    conf = hocon.load(conf_path)
    # tiny shapes on CPU: force f32 so bf16 flagship confs run fast here
    model = make_model(conf["model"], dtype=jnp.float32)
    rcfg = RendererConfig.from_conf(conf["renderer"])
    rcfg = rcfg.replace(n_coarse=4, n_fine=2 if rcfg.n_fine else 0,
                        n_fine_depth=1 if rcfg.n_fine_depth else 0)

    SB, NS, H, W, R = 1, 2, 16, 16, 4
    host = np.random.default_rng(0)
    imgs = jnp.asarray(host.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NS, 1, 1))
    poses[..., 2, 3] = 1.3
    poses = jnp.asarray(poses)
    focal = jnp.full((SB, 2), float(W))

    variables = model.init(
        jax.random.PRNGKey(0), imgs, poses, focal,
        jnp.zeros((SB, 8, 3)), viewdirs=jnp.zeros((SB, 8, 3)),
    )
    enc = model.apply(variables, imgs, poses, focal, None, method="encode")

    def qf(xyz, vd, coarse):
        return model.apply(variables, enc, xyz, vd, coarse, method="query")

    rays = jnp.concatenate(
        [jnp.zeros((SB, R, 3)), jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (SB, R, 1)),
         jnp.full((SB, R, 1), 0.8), jnp.full((SB, R, 1), 1.8)], axis=-1,
    )
    out = render_rays(qf, rays, jax.random.PRNGKey(1), rcfg,
                      use_viewdirs=model.use_viewdirs)
    head = out["fine"] if rcfg.using_fine else out["coarse"]
    assert np.isfinite(np.asarray(head["rgb"])).all()


def test_expconf_names_resolve():
    """expconf.conf must point every experiment at an existing config."""
    expconf = hocon.load(os.path.join(_ROOT, "expconf.conf"))
    cfgs = expconf.get_config("config", None)
    if cfgs is None:
        pytest.skip("no expconf mappings")
    for name in cfgs:
        path = cfgs.get_string(name)
        assert os.path.exists(os.path.join(_ROOT, path)) or os.path.exists(path), (
            name, path)
