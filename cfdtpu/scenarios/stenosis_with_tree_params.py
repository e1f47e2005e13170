"""Tree-generation constants for the stenosis_with_tree scenario.

Rebuild of /root/reference/src/scenarios/stenosis_with_tree_params.py:
a dependency-free constants module shared by the scenario and the
offline tree-synthesis stage (editable in one place, importable outside
the solver environment). The VascuSynth knobs feed
cfdtpu.geom.tree.vascusynth.write_vascusynth_inputs when the binary is
available; the 2D projection/coupling constants drive the native path.
"""

# -- tree synthesis -------------------------------------------------------
TREE_N_TERMINAL = 5          # terminal vessels / outlets
TREE_VOLUME_ML = 0.01        # perfusion volume (mL); sets voxel size
TREE_Q_IN = 1.0              # inlet flow rate (mL/min)
TREE_PERF_PRESSURE = 13332   # perfusion pressure (~100 mmHg, Pa)
TREE_TERM_PRESSURE = 1000    # terminal pressure (Pa)
TREE_MURRAY_EXPONENT = 3.0   # Murray's law exponent gamma
TREE_LAMBDA = 2.0            # optimality weight lambda
TREE_MU_VS = 1.0             # synthesizer-internal viscosity weight
TREE_MIN_DISTANCE = 2        # minimum inter-node distance (voxels)
TREE_CLOSEST_NEIGHBOURS = 5  # optimizer neighbour count
TREE_RANDOM_SEED = 42        # RNG seed (vary for other topologies)
TREE_VESSEL_LOSS_FACTOR = 0.0  # fraction of terminal vessels to prune
TREE_TMP_DIR = "cfdtpu/geom/tree/tmp"  # synthesis working directory

# -- 2D projection / scaling ----------------------------------------------
# None -> auto-fit: tree Y-extent scaled to the artery height H;
# a float is an explicit coordinate conversion factor.
TREE_COORD_SCALE = None

# Slope of the trapezoidal coupling between the stenosis outlet (width H)
# and the tree root channel (width 2*r_root):
# slope = (H/2 - r_root) / coupling_length (length derived from it).
TREE_COUPLING_SLOPE = 0.1
