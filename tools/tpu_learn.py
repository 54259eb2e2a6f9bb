"""On-TPU bf16 learning drive: the fast path (tanh-gelu, rbg noise, grid
fold, bf16 DFT matmuls) must actually FIT a learnable synthetic task on
the real chip, not just on the CPU/f32 golden path the test suite runs.

Validated on v5e (2026-08-17): loss 1.678 -> 0.448 over 40 epochs
(DPOT embed-256/depth-4 @64^2, adam + cycle schedule, noise 5e-4).
Run:  python tools/tpu_learn.py   (~5 min incl. compiles)."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from dpot_tpu.data import DataLoader, MixedTemporalDataset
from dpot_tpu.data.registry import make_synthetic_spec
from dpot_tpu.models import build_model
from dpot_tpu.train.optimizers import build_optimizer
from dpot_tpu.train.schedules import build_schedule
from dpot_tpu.train.state import TrainState, training_key
from dpot_tpu.train.step import make_train_step
from dpot_tpu.utils.profiling import fence

make_synthetic_spec("tpu_learn", train_size=32, test_size=8, t_total=16,
                    t_test=4, in_size=(64, 64), n_channels=2)
ds = MixedTemporalDataset(["tpu_learn"], res=64, t_in=6, t_ar=1, train=True)
dl = DataLoader(ds, 8, shuffle=True, num_workers=4, seed=0)
model = build_model("DPOT", img_size=64, patch_size=8, in_channels=2,
                    in_timesteps=6, out_timesteps=1, embed_dim=256, depth=4,
                    n_blocks=4, modes=16, n_cls=1, dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.zeros((8, 64, 64, 6, 2)))
epochs = 40
tx = build_optimizer("adam", build_schedule("cycle", 2e-3, len(dl), epochs, warmup_epochs=2), grad_clip=1.0)
state = TrainState.create(model.apply, params, tx, training_key(1))
step = make_train_step(t_bundle=1, noise_scale=5e-4)
first = last = None
for ep in range(epochs):
    tot = 0.0
    for x, y, msk, cls in dl:
        state, aux = step(state, {"x": jnp.asarray(x), "y": jnp.asarray(y),
                                  "msk": jnp.asarray(msk), "cls": jnp.asarray(cls)})
        tot += fence(aux["loss_step"])
    if first is None:
        first = tot
    last = tot
    if ep % 10 == 0 or ep == epochs - 1:
        print(f"epoch {ep}: loss {tot / len(ds):.4f}", flush=True)
assert np.isfinite(last)
assert last < 0.5 * first, (first, last)
print(f"TPU bf16 LEARNS: {first/len(ds):.4f} -> {last/len(ds):.4f} ok")
