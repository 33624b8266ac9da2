from .shard import ShardedProblem, make_sharded_problem, sharded_newton
