"""Host-side utilities: image IO, config, logging, timing."""

from pnp_svrg_tpu.utils.io import load_image, SET12_DIR, REFERENCE_DATA_DIR

__all__ = ["load_image", "SET12_DIR", "REFERENCE_DATA_DIR"]
