from .krylov import cg, bicgstab, gmres  # noqa: F401
