"""Distributed assembly: shard_map over mesh partitions.

Replaces the reference's MPI domain decomposition (implicit in dolfinx:
every function space has a parallel index_map with ghosts, SURVEY.md §2.9;
ghost updates at /root/reference/src/solvers/stabilized_schur.py:137-142,168,175,
allreduce at src/scenario.py:272-281). TPU-native design, stage 1:

- **Element-sharded, dof-replicated**: cells (the FLOP-heavy element
  kernels) are partitioned across devices; each device scatter-adds its
  partition's contributions into a full-length residual and a single
  psum over the mesh axis replaces both the REVERSE (ghost-accumulate)
  and FORWARD (owner-broadcast) ghost updates in one collective.
- Krylov vector algebra runs replicated (identical on all devices), so
  dot products need no extra collectives.

This keeps the whole Newton-Krylov step valid under shard_map/jit for any
device count; dof-partitioned halos (ppermute exchange) are the follow-up
optimization for very large meshes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..forms import StabilizedNSForm


def make_device_mesh(n_devices: int | None = None) -> DeviceMesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return DeviceMesh(np.array(devs[:n]), ("cells",))


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    pad = n - arr.shape[0]
    if pad == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)


class ShardedNSForm:
    """Wraps a StabilizedNSForm with a cell-sharded residual.

    Same `residual`/`diagonal` interface as StabilizedNSForm, so solvers
    swap it in transparently. Cells are padded to a multiple of the device
    count; padded duplicates are masked out of the scatter.
    """

    def __init__(self, form: StabilizedNSForm, device_mesh: DeviceMesh):
        self.inner = form
        self.device_mesh = device_mesh
        self.V, self.Q = form.V, form.Q
        self.mesh = form.mesh
        self.dim = form.dim
        self.dtype = form.dtype

        nd = device_mesh.devices.size
        nc = form.mesh.num_cells
        nc_pad = ((nc + nd - 1) // nd) * nd

        dm_u = np.asarray(form.dofmap_u)
        dm_p = np.asarray(form.dofmap_p)
        cc = np.asarray(form.cell_coords)
        hh = np.asarray(form.cell_h)
        mask = np.zeros(nc_pad, dtype=np.asarray(cc).dtype)
        mask[:nc] = 1.0

        self.dofmap_u = jnp.asarray(_pad_to(dm_u, nc_pad))
        self.dofmap_p = jnp.asarray(_pad_to(dm_p, nc_pad))
        self.cell_coords = jnp.asarray(_pad_to(cc, nc_pad))
        self.cell_h = jnp.asarray(_pad_to(hh, nc_pad))
        self.cell_mask = jnp.asarray(mask)

        # keep the serial form's auxiliary API (l2_norm_sq etc.)
        self.l2_norm_sq = form.l2_norm_sq

        self._residual_sharded = self._build_residual()

    def _build_residual(self):
        form = self.inner
        kernel = form._kernel
        n_u, n_p, dim = self.V.num_dofs, self.Q.num_dofs, self.dim
        dtype = self.dtype

        def local(u, p, aux, dm_u, dm_p, cc, hh, mask, prm):
            aux_e = tuple(a[dm_u] for a in aux)
            ru_e, rp_e = jax.vmap(
                kernel, in_axes=(0, 0, 0, 0, 0, None)
            )(u[dm_u], p[dm_p], aux_e, cc, hh, prm)
            ru_e = ru_e * mask[:, None, None]
            rp_e = rp_e * mask[:, None]
            ru = jnp.zeros((n_u, dim), dtype).at[dm_u].add(ru_e)
            rp = jnp.zeros((n_p,), dtype).at[dm_p].add(rp_e)
            ru = jax.lax.psum(ru, "cells")
            rp = jax.lax.psum(rp, "cells")
            return ru, rp

        sharded = shard_map(
            local,
            mesh=self.device_mesh,
            in_specs=(
                P(), P(), P(),
                P("cells"), P("cells"), P("cells"), P("cells"), P("cells"),
                P(),
            ),
            out_specs=(P(), P()),
        )

        def residual(u, p, aux, prm):
            ru, rp = sharded(
                u, p, aux,
                self.dofmap_u, self.dofmap_p,
                self.cell_coords, self.cell_h, self.cell_mask, prm,
            )
            for block in form._facet_blocks:
                dm_u, ru_f = form._block_residual(block, u, p, aux, prm)
                ru = ru.at[dm_u].add(ru_f)
            return ru, rp

        return residual

    def residual(self, u, p, aux, prm):
        return self._residual_sharded(u, p, aux, prm)

    # Jacobian-side API: delegated to the serial form for now (evaluated
    # identically on every device). The element-Jacobian build happens once
    # per Newton iteration; sharding it (and the matvec gather/scatter)
    # over the cell axis is the next distribution stage.
    def element_jacobians(self, u, p, aux, prm):
        return self.inner.element_jacobians(u, p, aux, prm)

    def apply_element_matrices(self, A_cells, A_blocks, v_flat):
        return self.inner.apply_element_matrices(A_cells, A_blocks, v_flat)

    def jacobian_diagonal(self, A_cells, A_blocks):
        return self.inner.jacobian_diagonal(A_cells, A_blocks)

    def facet_flux(self, u, name):
        return self.inner.facet_flux(u, name)

    def __getattr__(self, name):
        # delegate everything else (n_u_flat, apply_sub_block,
        # pressure_matrices, scatters, tables, ...) to the serial form
        return getattr(self.inner, name)
