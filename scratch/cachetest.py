import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys
sys.argv = ['x', '16384', 'grid']
exec(open('scratch/minibench2.py').read())
