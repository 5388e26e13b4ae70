import json, time, sys
import numpy as np

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 14
SCENES = 2
import jax, jax.numpy as jnp
from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
from nerf_downstream_tpu.data.utils import collate_mink
from nerf_downstream_tpu.models import get_model
from nerf_downstream_tpu.train.loop import array_batch
from nerf_downstream_tpu.train.modules import SegmentationTraining

rng = np.random.default_rng(0)
samples = []
for _ in range(SCENES):
    sc = make_synthetic_scene(rng, n_voxels=CAP // SCENES - 100, reso=(128,128,128), with_labels=True)
    samples.append({"coordinates": sc["coords"].astype(np.float32),
                    "features": np.concatenate([sc["density"], sc["sh"]], 1)[:, 1:28].astype(np.float32),
                    "labels": sc["labels"]})
batch = array_batch(collate_mink(samples, capacity=CAP))
model = get_model(name="Res16UNet18A", out_channel=20, num_batches=SCENES, compute_dtype=jnp.bfloat16)
task = SegmentationTraining(model, optimizer_name="SGD", scheduler_name="none", lr=0.1, ignore_label=-100)
t0=time.time()
state = task.create_state(jax.random.PRNGKey(0), batch)
print("init done", time.time()-t0, flush=True)
step = task.make_train_step(donate=True)
t0=time.time()
state, mets = step(state, batch); jax.block_until_ready(state.params)
print("compile+first step", time.time()-t0, flush=True)
t0=time.time()
N=5
for _ in range(N):
    state, mets = step(state, batch)
jax.block_until_ready(state.params)
dt=(time.time()-t0)/N
print(json.dumps({"cap": CAP, "step_s": dt, "voxels_per_s": int(batch["mask"].sum())/dt}), flush=True)
