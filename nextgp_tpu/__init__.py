"""nextgp_tpu — TPU-native Bayesian genomic prediction.

A from-scratch JAX/XLA/Pallas re-design of the method surface of
`datasciencetoolkit/NextGP.jl` (mounted read-only at /root/reference):
whole-genome Bayesian regression (BayesPR/A/B/C/R/RCpi/RCplus/LV),
Henderson mixed-model random effects (pedigree/GBLUP), summary-statistic
priors, and the GRN structural-equation sampler — engineered for TPU:
int8 HBM-resident genotypes, blocked Gram single-site Gibbs on the MXU,
column-sharded marker matrices with psum-merged residual corrections,
data-parallel chains.
"""
from .api.priors import (  # noqa: F401
    BayesB,
    BayesC,
    BayesLV,
    BayesPR,
    BayesR,
    BayesRCpi,
    BayesRCplus,
    Random,
    RandomEffect,
    SummaryStatistics,
)
from .api.spec import FixedTerm, MarkerTerm, ModelSpec, RandomTerm  # noqa: F401
from .data.ingest import MarkerData, from_array, read_genotype_file  # noqa: F401
from .engine.plan import assemble  # noqa: F401
from .engine.sweep import make_sweep  # noqa: F401

__version__ = "0.1.0"
