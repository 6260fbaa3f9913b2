"""Spectral complex IOR tables for common conductors.

The reference loads per-material eta/k spectra from
resources/data/ior/<name>.{eta,k}.spd (reference
include/mitsuba/render/ior.h:100-144 complex_ior_from_file; the data
submodule is empty in this snapshot). These tables are coarse resamplings
of the same public measurements (Johnson & Christy 1972 for Au/Ag/Cu;
Rakic et al. 1998 for Al) over the visible range; under tpu_spectral the
conductor family interpolates eta(lambda)/k(lambda) at the per-lane hero
wavelengths, replacing the rgb-tint approximation.

Each entry: (wavelengths_nm, eta, k) as tuples (static pytree aux data).
"""

CONDUCTOR_SPECTRA = {
    "Au": (
        (400.0, 450.0, 500.0, 532.0, 550.0, 600.0, 650.0, 700.0, 750.0,
         800.0),
        (1.66, 1.43, 0.86, 0.54, 0.43, 0.25, 0.17, 0.16, 0.16, 0.17),
        (1.96, 1.85, 1.90, 2.17, 2.46, 2.99, 3.33, 3.80, 4.26, 4.70),
    ),
    "Ag": (
        (400.0, 450.0, 500.0, 550.0, 600.0, 650.0, 700.0, 750.0, 800.0),
        (0.054, 0.040, 0.050, 0.055, 0.055, 0.052, 0.041, 0.033, 0.037),
        (2.10, 2.46, 2.88, 3.28, 3.72, 4.15, 4.52, 4.93, 5.29),
    ),
    "Cu": (
        (400.0, 450.0, 500.0, 550.0, 583.0, 600.0, 650.0, 700.0, 750.0,
         800.0),
        (1.175, 1.15, 1.12, 1.04, 0.83, 0.47, 0.22, 0.21, 0.22, 0.26),
        (2.21, 2.40, 2.58, 2.59, 2.60, 2.81, 3.43, 3.75, 4.05, 4.47),
    ),
    "Al": (
        (400.0, 450.0, 500.0, 550.0, 600.0, 650.0, 700.0, 750.0, 800.0),
        (0.490, 0.618, 0.769, 0.958, 1.20, 1.47, 1.83, 2.40, 2.80),
        (4.86, 5.47, 6.08, 6.69, 7.26, 7.79, 8.31, 8.62, 8.45),
    ),
}

__all__ = ["CONDUCTOR_SPECTRA"]
