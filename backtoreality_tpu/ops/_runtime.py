"""Backend plumbing shared by the op library."""

import jax


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU.

    Lets the same kernel code execute (slowly) on CPU for unit tests and
    the virtual-device mesh, while compiling via Mosaic on real TPUs.
    """
    return jax.default_backend() != "tpu"
