"""Tree-rewriting operators (the DML) and the fixpoint rewrite loop."""

from architxt_spark.operators.pytree_ops import (  # noqa: F401
    find_collections,
    find_relations,
    reduce_all,
    reduce_bottom,
    reduce_top,
)
from architxt_spark.operators.engine import (  # noqa: F401
    apply_tree_op,
    find_groups,
    rewrite,
    simple_rewrite,
    simplify_names,
)
