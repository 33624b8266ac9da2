from .inlet import solve_inlet_profiles, InletProfile
