"""Multi-chip distribution layer (SPMD over a jax.sharding.Mesh).

The reference has no parallelism of any kind (SURVEY.md section 2); these
modules are the first-class new components of the TPU build:

  mesh         — mesh construction helpers ("rows" / "starts" axes)
  pchol        — block-cyclic distributed Cholesky, TRSM, logdet, inverse
  pgp          — distributed exact GP: NLL + analytic gradient, fit,
                 posterior, prediction (+ input gradients), 2-D multistart
  psparse      — data-sharded FITC / VFE
  pmultistart  — restart populations sharded across chips

Collectives ride ICI (psum / all_gather inside shard_map); everything is
testable on a virtual CPU mesh (tests/conftest.py).
"""
