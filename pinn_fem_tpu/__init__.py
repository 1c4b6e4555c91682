"""pinn_fem_tpu — TPU-native FEM + PINN inverse-problem framework.

A ground-up JAX/XLA re-design with the capabilities of the reference
PINN-FEM stack (rpacheco-blazquez/PINN-FEM): 1D/2D/3D truss FEM, NN-
parameterized material fields (E, A, rho), and four coupled solvers
(Newton-Raphson, gradient descent, hybrid GD->NR, full Newton with the
coupled (u, theta) Hessian) under a universal incremental-loading driver —
plus Gauss-Newton/Levenberg-Marquardt, multi-device sharding utilities, and
the reference-compatible JSON CLI contract.

Beyond the reference's statics: transient dynamics (explicit / Newmark /
exact modal superposition; geometric nonlinearity; ensembles; distributed
shard_map integration; checkpoint/resume; moving loads and seismic base
excitation), modal analysis (+prestress), linearized buckling, harmonic /
response-spectrum / random-vibration analysis, arc-length (Riks)
continuation through limit points, thermal loads, support settlement,
Guyan / Craig-Bampton reduction, and an identification family spanning
three data domains — transient trajectories (discrete adjoint through
the integrator, incl. Rayleigh damping and spatial MLP property fields),
FRF amplitude sweeps (multi-start log-amplitude fitting), and extracted
natural frequencies (EMA, with the EA/rho scaling degeneracies enforced)
— plus the design-side inverse: sizing optimization (minimum-mass member
areas under stress/displacement limits via FSD or augmented-Lagrangian
adjoint descent, and compliance at fixed volume) — every capability
validated against closed forms (PARITY.md) and served through the same
CLI / HTTP / UI tiers as the statics.
"""

from .utils.runtime import configure

configure()

from .config import SolverConfig, SolverResult  # noqa: E402
from .models.fields import (  # noqa: E402
    Material,
    MLPField,
    ScalarField,
    make_mlp_field,
    to_field,
)
from .models.frame import (  # noqa: E402
    frame_modal_banded,
    solve_frame_static_banded,
    FrameProblem,
    frame_buckling,
    frame_geometric_stiffness,
    frame_matrices,
    frame_modal,
    frame_harmonic,
    frame_reliability,
    frame_static_response,
    identify_frame_properties,
    optimize_frame_inertia,
    optimize_frame_inertia_rbdo,
    solve_frame_static,
    solve_frame_transient,
)
from .models.frame3d import (  # noqa: E402
    SpaceFrameProblem,
    solve_space_frame_static,
    solve_space_frame_transient,
    space_frame_harmonic,
    space_frame_matrices,
    space_frame_modal,
)
from .models.shell import (  # noqa: E402
    ShellProblem,
    arch_strip_mesh,
    cylinder_panel_mesh,
    hemisphere_mesh,
    shell_buckling,
    shell_geometric_stiffness,
    shell_harmonic,
    shell_matrices,
    shell_modal,
    solve_shell_static,
    solve_shell_transient,
)
from .models.plane import (  # noqa: E402
    PlaneProblem,
    annulus_mesh,
    edge_load,
    plane_buckling,
    plane_harmonic,
    plane_matrices,
    plane_modal,
    plane_stable_dt,
    pressure_load,
    rect_mesh,
    solve_plane_static,
    solve_plane_transient,
)
from .models.solid import (  # noqa: E402
    SolidProblem,
    box_mesh,
    extrude_mesh,
    identify_solid_young_banded,
    solid_buckling,
    solid_harmonic,
    solid_matrices,
    solid_modal,
    solid_modal_banded,
    solid_stable_dt,
    solid_static_response,
    solve_solid_static,
    solve_solid_static_banded,
    solve_solid_transient,
    solve_solid_transient_banded,
    surface_load,
)
from .models.plate import (  # noqa: E402
    PlateProblem,
    identify_plate_young,
    identify_plate_young_banded,
    mindlin_navier_w,
    mindlin_ss_buckling_nx,
    plate_buckling,
    plate_geometric_stiffness,
    plate_harmonic,
    plate_matrices,
    plate_modal,
    plate_static_response,
    plate_supports,
    recover_moments,
    solve_plate_static,
    solve_plate_static_banded,
    solve_plate_transient,
)
from .models.problem import (  # noqa: E402
    ProblemData,
    TrussProblem,
    element_dofs,
    free_and_fixed_dofs,
)
from .ops.assembly import (  # noqa: E402
    assemble_system,
    compute_residual_and_jacobian,
    internal_force_and_strain,
)
from .ops.mass import (  # noqa: E402
    consistent_mass,
    lumped_mass,
    total_mass,
)
from .ops.thermal import (  # noqa: E402
    thermal_free_strains,
    thermal_loads,
)
from .solvers.buckling import (  # noqa: E402
    BucklingResult,
    buckling_analysis,
    buckling_eigenvalues,
)
from .solvers.dynamics import (  # noqa: E402
    TransientResult,
    base_excitation_force_fn,
    moving_load_force_fn,
    solve_transient,
    solve_transient_checkpointed,
    stable_dt,
)
from .solvers.harmonic import (  # noqa: E402
    HarmonicResult,
    harmonic_response,
)
from .solvers.modal import (  # noqa: E402
    ModalResult,
    mac,
    modal_analysis,
    modal_eigenpairs,
    modal_eigenvalues,
    rayleigh_coefficients,
)
from .solvers.driver import solve  # noqa: E402
from .solvers.full_newton import solve_full_nr  # noqa: E402
from .solvers.fused import solve_fused  # noqa: E402
from .solvers.gauss_newton import solve_gauss_newton  # noqa: E402
from .solvers.gd import solve_gd  # noqa: E402
from .solvers.hybrid import solve_hybrid  # noqa: E402
from .solvers.fatigue import (  # noqa: E402
    SpectralFatigue,
    davenport_peak_factor,
    dirlik_damage_rate,
    first_passage_probability,
    narrowband_damage_rate,
    rainflow_cycles,
    rainflow_damage,
    spectral_fatigue,
    spectral_moments,
    synthesize_gaussian_history,
)
from .solvers.random_response import (  # noqa: E402
    RandomResponseResult,
    random_response,
)
from .solvers.reliability import (  # noqa: E402
    ReliabilityResult,
    form_reliability,
)
from .solvers.reduction import (  # noqa: E402
    ReducedModel,
    craig_bampton,
    craig_bampton_dense,
    guyan_reduce,
    guyan_reduce_dense,
    reduce_loads,
    reduce_model,
)
from .solvers.plane_plasticity import (  # noqa: E402
    PlanePlasticResult,
    solve_plane_plastic,
)
from .solvers.solid_plasticity import (  # noqa: E402
    SolidPlasticResult,
    solve_solid_plastic,
)
from .solvers.plate_plasticity import (  # noqa: E402
    PlatePlasticResult,
    solve_plate_plastic,
)
from .solvers.shell_plasticity import (  # noqa: E402
    ShellPlasticResult,
    solve_shell_plastic,
)
from .solvers.shell_nonlinear import (  # noqa: E402
    ShellNonlinearResult,
    marguerre_energy,
    solve_shell_nonlinear,
    solve_shell_nonlinear_banded,
    solve_shell_riks,
)
from .solvers.continuum_reliability import (  # noqa: E402
    continuum_reliability,
)
from .solvers.continuum_sizing import (  # noqa: E402
    optimize_plane_thickness,
    optimize_plate_thickness,
)
from .solvers.plasticity import (  # noqa: E402
    PlasticStaticResult,
    PlasticTransientResult,
    solve_elastoplastic,
    solve_transient_plastic,
)
from .solvers.continuum_transient_plastic import (  # noqa: E402
    ContinuumPlasticTransientResult,
    solve_plane_transient_plastic,
    solve_solid_transient_plastic,
)
from .solvers.continuum_spectrum import (  # noqa: E402
    ContinuumFatigueResult,
    ContinuumRandomResult,
    ContinuumSpectrumResult,
    continuum_random_response,
    continuum_response_spectrum,
    continuum_spectral_fatigue,
    continuum_stress_frf,
    frame_fiber_stress_frf,
    shell_fiber_stress_frf,
)
from .solvers.frame_plastic import (  # noqa: E402
    FramePushoverResult,
    frame_pushover,
)
from .solvers.riks import (  # noqa: E402
    RiksResult,
    solve_riks,
)
from .solvers.spectrum import (  # noqa: E402
    DirectionalSpectrumResult,
    SpectrumCurve,
    SpectrumResult,
    directional_combination,
    response_spectrum,
    spectrum_from_history,
)
from .solvers.frequency_inverse import (  # noqa: E402
    frf_probe_amplitudes,
    identify_from_frf,
)
from .solvers.modal_inverse import (  # noqa: E402
    identify_field_from_modal,
    identify_from_modal,
    modal_observables,
)
from .solvers.transient_inverse import (  # noqa: E402
    identify_field_from_transient,
    identify_from_transient,
    transient_probe_response,
)
from .solvers.sizing import (  # noqa: E402
    SizingResult,
    fatigue_life_ratio,
    fully_stressed_design,
    member_force_frf_sq,
    optimize_compliance_oc,
    optimize_sizing,
    static_response_elem,
)
from .solvers.legacy import (  # noqa: E402
    LegacySolverConfig,
    PINNGradientDescentConfig,
    PINNSolverConfig,
    PINNSolverResult,
    solve_incremental_newton,
    solve_pinn_gradient_descent,
    solve_pinn_newton_raphson,
)
from .solvers.newton import solve_nr  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "SolverResult",
    "Material",
    "MLPField",
    "ScalarField",
    "make_mlp_field",
    "to_field",
    "ProblemData",
    "FrameProblem",
    "SpaceFrameProblem",
    "ShellProblem",
    "PlaneProblem",
    "SolidProblem",
    "PlateProblem",
    "solve_plate_static",
    "solve_plate_static_banded",
    "solve_plate_transient",
    "plate_static_response",
    "identify_plate_young",
    "identify_plate_young_banded",
    "recover_moments",
    "plate_modal",
    "plate_buckling",
    "plate_geometric_stiffness",
    "plate_harmonic",
    "plate_matrices",
    "plate_supports",
    "mindlin_navier_w",
    "mindlin_ss_buckling_nx",
    "solid_static_response",
    "solve_solid_static",
    "solve_solid_static_banded",
    "solve_solid_transient",
    "solve_solid_transient_banded",
    "solid_stable_dt",
    "solid_modal",
    "solid_modal_banded",
    "solid_buckling",
    "solid_harmonic",
    "solid_matrices",
    "identify_solid_young_banded",
    "box_mesh",
    "extrude_mesh",
    "surface_load",
    "solve_plane_static",
    "solve_plane_transient",
    "plane_buckling",
    "plane_harmonic",
    "plane_modal",
    "plane_matrices",
    "rect_mesh",
    "annulus_mesh",
    "edge_load",
    "pressure_load",
    "solve_plane_plastic",
    "PlatePlasticResult",
    "solve_plate_plastic",
    "ShellPlasticResult",
    "solve_shell_plastic",
    "ShellNonlinearResult",
    "marguerre_energy",
    "solve_shell_nonlinear",
    "solve_shell_nonlinear_banded",
    "solve_shell_riks",
    "continuum_reliability",
    "optimize_plane_thickness",
    "optimize_plate_thickness",
    "solve_solid_plastic",
    "solve_frame_static",
    "solve_frame_static_banded",
    "frame_modal_banded",
    "frame_geometric_stiffness",
    "frame_modal",
    "frame_buckling",
    "frame_matrices",
    "solve_frame_transient",
    "solve_space_frame_static",
    "space_frame_modal",
    "solve_space_frame_transient",
    "space_frame_harmonic",
    "space_frame_matrices",
    "solve_shell_static",
    "shell_modal",
    "shell_matrices",
    "shell_buckling",
    "shell_geometric_stiffness",
    "solve_shell_transient",
    "shell_harmonic",
    "arch_strip_mesh",
    "cylinder_panel_mesh",
    "hemisphere_mesh",
    "frame_static_response",
    "frame_harmonic",
    "frame_reliability",
    "frame_pushover",
    "FramePushoverResult",
    "identify_frame_properties",
    "optimize_frame_inertia",
    "optimize_frame_inertia_rbdo",
    "TrussProblem",
    "element_dofs",
    "free_and_fixed_dofs",
    "assemble_system",
    "compute_residual_and_jacobian",
    "internal_force_and_strain",
    "lumped_mass",
    "consistent_mass",
    "total_mass",
    "thermal_loads",
    "thermal_free_strains",
    "solve_transient",
    "solve_transient_checkpointed",
    "base_excitation_force_fn",
    "moving_load_force_fn",
    "stable_dt",
    "TransientResult",
    "modal_analysis",
    "modal_eigenvalues",
    "modal_eigenpairs",
    "rayleigh_coefficients",
    "mac",
    "buckling_analysis",
    "buckling_eigenvalues",
    "BucklingResult",
    "harmonic_response",
    "HarmonicResult",
    "frf_probe_amplitudes",
    "identify_field_from_transient",
    "identify_from_frf",
    "identify_field_from_modal",
    "identify_from_modal",
    "modal_observables",
    "identify_from_transient",
    "transient_probe_response",
    "response_spectrum",
    "spectrum_from_history",
    "directional_combination",
    "DirectionalSpectrumResult",
    "SpectrumCurve",
    "SpectrumResult",
    "SizingResult",
    "fully_stressed_design",
    "optimize_compliance_oc",
    "optimize_sizing",
    "fatigue_life_ratio",
    "member_force_frf_sq",
    "static_response_elem",
    "PlasticStaticResult",
    "PlasticTransientResult",
    "solve_elastoplastic",
    "PlanePlasticResult",
    "solve_transient_plastic",
    "ContinuumPlasticTransientResult",
    "solve_plane_transient_plastic",
    "solve_solid_transient_plastic",
    "ContinuumFatigueResult",
    "ContinuumRandomResult",
    "continuum_spectral_fatigue",
    "continuum_stress_frf",
    "frame_fiber_stress_frf",
    "shell_fiber_stress_frf",
    "ContinuumSpectrumResult",
    "continuum_random_response",
    "continuum_response_spectrum",
    "plane_stable_dt",
    "solve_riks",
    "RiksResult",
    "random_response",
    "SpectralFatigue",
    "davenport_peak_factor",
    "dirlik_damage_rate",
    "first_passage_probability",
    "narrowband_damage_rate",
    "rainflow_cycles",
    "rainflow_damage",
    "spectral_fatigue",
    "spectral_moments",
    "synthesize_gaussian_history",
    "RandomResponseResult",
    "form_reliability",
    "ReliabilityResult",
    "guyan_reduce",
    "craig_bampton",
    "craig_bampton_dense",
    "guyan_reduce_dense",
    "reduce_model",
    "reduce_loads",
    "ReducedModel",
    "ModalResult",
    "solve",
    "solve_nr",
    "solve_gd",
    "solve_hybrid",
    "solve_full_nr",
    "solve_fused",
    "solve_gauss_newton",
    "solve_incremental_newton",
    "solve_pinn_gradient_descent",
    "solve_pinn_newton_raphson",
    "LegacySolverConfig",
    "PINNSolverConfig",
    "PINNGradientDescentConfig",
    "PINNSolverResult",
    "configure",
]
