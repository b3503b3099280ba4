from .qmc import (  # noqa: F401
    SAMPLER_INDEPENDENT,
    SAMPLER_STRATIFIED,
    SAMPLER_HALTON,
    SAMPLER_LD,
    sample_dim,
)
