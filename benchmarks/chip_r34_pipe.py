import time, json, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/alink_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from alink_tpu.detect import CascadeConfig, FaceModel, init_cascade_params
from alink_tpu.models import ArcFaceResNet34

def sync(x): return float(jnp.ravel(x.astype(jnp.float32))[0])
batch, size, iters = 256, 160, 20
embedder = ArcFaceResNet34()
eparams = embedder.init(jax.random.PRNGKey(0), jnp.zeros((1,112,112,3)))
cparams = init_cascade_params(jax.random.PRNGKey(1))
x = jax.random.uniform(jax.random.PRNGKey(2), (batch,size,size,3), jnp.float32, 0, 255)
cfg = CascadeConfig.typical(thresholds=(0.0,0.0,0.0))
fm = FaceModel(eparams, cparams, cfg, embedder=embedder)

@jax.jit
def chain(imgs, n):
    def body(i, carry):
        im, acc = carry
        feats = fm.pipeline(eparams, cparams, im)
        return im + 0.0*acc, acc + jnp.mean(feats)
    return jax.lax.fori_loop(0, n, body, (imgs, jnp.float32(0.0)))[1]

sync(chain(x, 1))
t0=time.perf_counter(); sync(chain(x, 0)); ov=time.perf_counter()-t0
t0=time.perf_counter(); sync(chain(x, iters))
dt=(time.perf_counter()-t0-ov)/iters
print(json.dumps({"metric":"detect_align_embed_throughput_r34","value":round(batch/dt,1),"ms_per_64":round(dt*1e3*64/batch,3)}))
