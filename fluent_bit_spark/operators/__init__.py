from fluent_bit_spark.operators.grep import GrepRule, grep
from fluent_bit_spark.operators.modify import ModifyCondition, ModifyRule, modify
from fluent_bit_spark.operators.record_modifier import record_modifier
from fluent_bit_spark.operators.nest import nest, lift
from fluent_bit_spark.operators.conditions import ConditionRule, compile_condition
from fluent_bit_spark.operators.content_modifier import content_modifier
from fluent_bit_spark.operators.sampling import sample_probabilistic
from fluent_bit_spark.operators.throttle import throttle
from fluent_bit_spark.operators.expect import expect

__all__ = [
    "GrepRule",
    "grep",
    "ModifyCondition",
    "ModifyRule",
    "modify",
    "record_modifier",
    "nest",
    "lift",
    "ConditionRule",
    "compile_condition",
    "content_modifier",
    "sample_probabilistic",
    "throttle",
    "expect",
]
