import time, sys
t00 = time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from bench import build
from shapeformer_tpu.models.vqdif.vqdif import VQDIF
vqdif, sf = build()
rng = jax.random.PRNGKey(0)
cloud = jax.random.uniform(rng, (1, 8192, 3), minval=-0.8, maxval=0.8)
log("building vq_vars via eval_shape+init on encoder only...")
vq_vars = jax.jit(lambda r, c: vqdif.init(r, c, c[:, :4096]))(rng, cloud)
log("init done")
enc = jax.jit(lambda v, c: vqdif.apply(v, c, method=VQDIF.encode))
jax.block_until_ready(enc(vq_vars, cloud)); log("1 encode ok")
qc = jax.jit(lambda v, c: vqdif.apply(v, c, method=VQDIF.quantize_cloud))
jax.block_until_ready(qc(vq_vars, cloud)); log("2 quantize_cloud ok")
sf.representer.set_vqdif(vqdif, vq_vars)
rep = sf.representer
ec = jax.jit(lambda v, c: rep.encode_cloud(c, vqdif_vars=v))
jax.block_until_ready(ec(vq_vars, cloud)); log("3 encode_cloud ok")
gi = jax.jit(lambda v, c: rep.get_indices(Xct=c, stage="test", vqdif_vars=v))
out = jax.block_until_ready(gi(vq_vars, cloud)); log("4 get_indices ok")
