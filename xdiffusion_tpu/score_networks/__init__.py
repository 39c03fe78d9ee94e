"""Score-network zoo (flax.linen modules, NHWC layout).

Every network follows the reference signature contract
(/root/reference/xdiffusion/score_networks/): `__call__(x, context)` where
x is the noisy batch and context is a dict of conditioning arrays. Models
with learned sigma return an (epsilon, log_variance) tuple.
"""
