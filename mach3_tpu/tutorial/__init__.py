from .toy import ToyExperiment, build_toy

__all__ = ["ToyExperiment", "build_toy"]
