"""The /verify drive recipe (see .claude/skills/verify/SKILL.md), runnable:
fit-through-render PSNR climb, behind-camera probe, hashgrid OOB probe.
Run from any cwd: python /root/repo/scripts/verify_drive.py (CPU, ~40 s)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from instag_tpu.models import gaussians as G
from instag_tpu.ops.rasterize import RasterizeConfig
from instag_tpu.render import Camera, render
from instag_tpu.utils.graphics import world_to_view, projection_matrix
from instag_tpu.utils.losses import psnr

rng = np.random.default_rng(0)
H = W = 64
view = world_to_view(np.eye(3), np.array([0, 0, 2.0])).T
proj = (projection_matrix(0.01, 100.0, 0.8, 0.8)
        @ world_to_view(np.eye(3), np.array([0, 0, 2.0]))).T
cam = Camera(jnp.asarray(view), jnp.asarray(proj),
             jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
             jnp.float32(np.tan(0.4)), jnp.float32(np.tan(0.4)))
cfg = RasterizeConfig(H, W)
bg = jnp.zeros(3)

tgt = G.create_from_points(jnp.asarray(rng.normal(size=(200, 3)) * 0.2),
                           jnp.asarray(rng.uniform(0.2, 1, (200, 3))), 256, 0, 1.0)
target = jax.jit(lambda s: render(cfg, cam, s, bg).image)(tgt)

st = G.create_from_points(jnp.asarray(rng.normal(size=(200, 3)) * 0.2),
                          jnp.asarray(rng.uniform(0.2, 1, (200, 3))), 256, 0, 1.0)
opt = G.adam_init(st.params)
lrs = {k: 0.01 if k == "xyz" else 0.02 for k in st.params.__dataclass_fields__}

@jax.jit
def step(st, opt):
    def loss(p):
        return jnp.abs(render(cfg, cam, st.replace(params=p), bg).image - target).mean()
    l, g = jax.value_and_grad(loss)(st.params)
    p, opt = G.adam_update(st.params, g, opt, lrs, st.alive)
    return st.replace(params=p), opt, l

def score(s):
    return float(psnr(jax.jit(lambda s: render(cfg, cam, s, bg).image)(s), target))

p0 = score(st)
for _ in range(75):
    st, opt, _ = step(st, opt)
mid = score(st)
st, opt = G.pack_resize(st, opt, 512, keep_slots=True)
assert abs(score(st) - mid) < 1e-6, "keep_slots resize changed the render"
for _ in range(75):
    st, opt, _ = step(st, opt)
p1 = score(st)
print(f"fit: PSNR {p0:.2f} -> {p1:.2f} dB (through keep_slots grow)")
assert p1 > p0 + 5.0

behind = G.create_from_points(
    jnp.asarray(rng.normal(size=(50, 3)) * 0.1 + np.array([0, 0, -10.0])),
    jnp.ones((50, 3)) * 0.5, 64, 0, 1.0)
out = jax.jit(lambda s: render(cfg, cam, s, bg))(behind)
assert int(out.radii.max()) == 0 and float(jnp.abs(out.image).max()) == 0.0
print("behind-camera probe OK")

from instag_tpu.ops.hashgrid import HashGridConfig, init_hashgrid, hashgrid_encode_jit
hcfg = HashGridConfig(input_dim=2, num_levels=4, level_dim=2)
emb = init_hashgrid(jax.random.key(0), hcfg)
feats = hashgrid_encode_jit(hcfg, emb, jnp.full((8, 2), 5.0), 1.0)
assert float(jnp.abs(feats).max()) == 0.0
g = jax.grad(lambda e: hashgrid_encode_jit(hcfg, e, jnp.zeros((8, 2)), 1.0).sum())(emb)
assert bool(jnp.isfinite(g).all())
print("hashgrid OOB probe OK")
print("VERIFY DRIVE PASSED")
