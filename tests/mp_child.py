"""Child program for the 2-process DCN test (test_multiprocess_dcn.py).

Run as: python mp_child.py <port> <process_id> <num_processes>
Each process gets 4 virtual CPU devices; together they form one 8-device
global mesh over the jax.distributed coordination service — the same
code path a TPU pod uses over DCN (SURVEY §2.5/§5.8), minus the ICI.
"""

import os
import sys


def main():
  port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
  os.environ["JAX_PLATFORMS"] = "cpu"
  os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
  for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "AXON_LOOPBACK_RELAY", "PALLAS_AXON_TPU_GEN"):
    os.environ.pop(var, None)

  import jax
  jax.config.update("jax_platforms", "cpu")

  from snerf_tpu.parallel.multihost import (
      init_multihost, local_batch_slice, process_shard)
  assert init_multihost(f"localhost:{port}", nproc, pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.local_device_count() == 4
  n_global = 4 * nproc
  assert len(jax.devices()) == n_global

  import numpy as np
  import jax.numpy as jnp
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

  # per-rank helpers behave like the reference's rank sharding
  shard = process_shard(10)
  assert set(shard) == {i for i in range(10) if (i + pid) % nproc == 0}
  assert local_batch_slice(64) == 64 // nproc

  mesh = Mesh(np.array(jax.devices()), ("data",))
  repl = NamedSharding(mesh, P())

  # 1) cross-process collective: global sum over a data-sharded array
  local = np.arange(4, dtype=np.float32) + 4 * pid
  garr = jax.make_array_from_process_local_data(
      NamedSharding(mesh, P("data")), local, (n_global,))
  total = jax.jit(jnp.sum, out_shardings=repl)(garr)
  expect = float(np.arange(n_global, dtype=np.float32).sum())
  assert float(total) == expect, (float(total), expect)
  print(f"[{pid}] collective sum ok: {float(total)}", flush=True)

  # 2) a REAL train step over the global mesh: every process executes the
  # same program; XLA psums the gradients across processes over the
  # coordination backend (the DDP/NCCL replacement, end to end).
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.mipnerf import MipNerfConfig
  from snerf_tpu.train.trainer import (
      TrainConfig, create_train_state, make_train_step)

  scene = make_synthetic_scene(num_images=4, H=16, W=16)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=4, num_fine=4, hidden_layer=16,
                       proposal_hidden_layer=16, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=2 * n_global, depth_loss=True)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  # Lift the (identical-on-every-process) host state to global
  # replicated arrays so the multi-process jit accepts it.
  state = jax.tree_util.tree_map(
      lambda a: jax.make_array_from_process_local_data(
          repl, np.asarray(a)), state)
  key = jax.make_array_from_process_local_data(
      repl, np.asarray(jax.random.PRNGKey(1)))

  with mesh:
    step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                           scene.near, scene.far, donate=False, mesh=mesh)
    state, metrics = step(state, key)
    loss0 = float(metrics["loss"])
    state, metrics = step(state, key)
    loss1 = float(metrics["loss"])
  assert np.isfinite(loss0) and np.isfinite(loss1), (loss0, loss1)
  assert loss1 < loss0, (loss0, loss1)  # same batch twice: must improve
  print(f"[{pid}] train step ok: loss {loss0:.5f} -> {loss1:.5f}",
        flush=True)
  print(f"MP_CHILD_OK {pid} {loss1:.6f}", flush=True)


if __name__ == "__main__":
  main()
