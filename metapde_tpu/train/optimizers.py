"""Outer-optimizer factory (reference: trainer_util.get_optimizer:593-612).

Maps the reference's flax.optim / flaxOptimizers choices onto optax:
- adam    -> optax.adam(b1=0.9, b2=0.99)      (trainer_util.py:595)
- rmsprop -> optax.adam(b1=0.0, b2=0.8)       (the reference's "rmsprop" is
             literally Adam with beta1=0, trainer_util.py:599)
- ranger  -> RAdam + Lookahead-free variant: optax.radam(b2=0.99); the
             reference uses flaxOptimizers.Ranger(use_gc=False)
             (trainer_util.py:602-605) whose core is RAdam.
- sgd     -> optax.sgd
"""

import optax


def get_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    if name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.99)
    if name == "rmsprop":
        return optax.adam(lr, b1=0.0, b2=0.8)
    if name == "ranger":
        return optax.radam(lr, b2=0.99)
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer: {name!r}")
