from .autocorr import (
    acceptance_rate_trace,
    autocorrelation_fft,
    batched_means,
    batched_means_variance_ratio,
    effective_sample_size,
    geweke,
    integrated_autocorr_time,
    power_spectrum,
)
from .chain_io import (
    combine_chains,
    load_chain,
    load_checkpoint,
    save_chain,
    save_checkpoint,
)
from .evidence import (
    log_prior_mass,
    stepping_stone_log_evidence,
    thermodynamic_log_evidence,
)
from .processor import ChainProcessor, PosteriorSummary
from .rhat import StreamingRhat, folded_rhat, rank_normalised_rhat, rhat, split_rhat

__all__ = [
    "acceptance_rate_trace",
    "autocorrelation_fft",
    "batched_means",
    "batched_means_variance_ratio",
    "effective_sample_size",
    "geweke",
    "integrated_autocorr_time",
    "power_spectrum",
    "combine_chains",
    "log_prior_mass",
    "stepping_stone_log_evidence",
    "thermodynamic_log_evidence",
    "load_chain",
    "load_checkpoint",
    "save_chain",
    "save_checkpoint",
    "ChainProcessor",
    "PosteriorSummary",
    "StreamingRhat",
    "folded_rhat",
    "rank_normalised_rhat",
    "rhat",
    "split_rhat",
]
