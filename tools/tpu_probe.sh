#!/bin/bash
# Quick aliveness probe for the tunneled TPU. Exit 0 = alive.
timeout ${1:-100} python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = (jnp.ones((4,4)) @ jnp.ones((4,4)))[0:1,0:1]
import numpy as np
print('TPU alive:', d[0], float(np.asarray(x)[0,0]))
" 2>&1 | tail -2
