import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from snerf_tpu.models.zipnerf import ZipNerfConfig
from snerf_tpu.train.zip_trainer import ZipTrainConfig, create_zip_train_state
from snerf_tpu.ops.rays import Rays

enc = sys.argv[1] if len(sys.argv) > 1 else "hash"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
zcfg = ZipNerfConfig(num_prop_samples=(8, 8), num_nerf_samples=8,
                     sample_n=2, encoder_type=enc)
ztcfg = ZipTrainConfig(batch_size=128, max_steps=10, lr_delay_steps=0)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
  model, state = create_zip_train_state(jax.random.PRNGKey(0), zcfg, ztcfg)
params = jax.device_put(state.params, jax.devices()[0])
d = np.random.RandomState(0).randn(n, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rays = Rays(origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
            viewdirs=jnp.asarray(d), radii=jnp.full((n, 1), 1e-3),
            lossmult=jnp.ones((n, 1)), near=jnp.full((n, 1), 0.5),
            far=jnp.full((n, 1), 60.0), app=jnp.zeros((n, 1), jnp.int32))

@jax.jit
def fwd(p, r):
  rend, _ = model.apply({"params": p}, r, rng=None)
  return rend[-1]["rgb"]

t0 = time.perf_counter()
out = fwd(params, rays)
v = float(out.sum())
print(f"{enc} n={n}: first call (compile+run) {time.perf_counter()-t0:.1f}s sum={v:.4f}", flush=True)
t0 = time.perf_counter()
v = float(fwd(params, rays).sum())
print(f"steady: {time.perf_counter()-t0:.3f}s", flush=True)
