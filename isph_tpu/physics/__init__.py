from isph_tpu.physics import (
    ale,
    bonds,
    diagnostics,
    electrokinetics,
    fluctuation,
    multiphase,
    ns_projection,
    qeq,
    shift,
    status,
    transport,
)
