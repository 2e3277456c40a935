"""FEM core: elements, boundary conditions, stiffness apply, solvers."""
