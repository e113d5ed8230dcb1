from .binning import (
    NonUniformBinning,
    PolygonBinning,
    SampleBinning,
    histogram,
)
from .teststats import (
    TestStatistic,
    barlow_beeston_llh,
    dembinski_abdelmotteleb_llh,
    get_test_stat_fn,
    icecube_llh,
    pearson_llh,
    poisson_llh,
)

__all__ = [
    "NonUniformBinning",
    "PolygonBinning",
    "SampleBinning",
    "histogram",
    "TestStatistic",
    "barlow_beeston_llh",
    "dembinski_abdelmotteleb_llh",
    "get_test_stat_fn",
    "icecube_llh",
    "pearson_llh",
    "poisson_llh",
]
