"""DataStream API facade (SURVEY.md section 1.4 item 3 / section 3.3).

The reference's third API surface — fluent DataStream programs with
keyed state, timers, windows, connected streams, broadcast state and
side outputs — lowered onto Spark DataFrames. See
``datastream.stream`` for the execution model.
"""

from flink_release_1_16_0_spark.datastream.functions import (
    AggregateFunction,
    AsyncFunction,
    AggregatingState,
    AggregatingStateDescriptor,
    BroadcastProcessFunction,
    CoGroupFunction,
    Collector,
    CoProcessFunction,
    CountWindow,
    FilterFunction,
    FlatMapFunction,
    JoinFunction,
    KeyedBroadcastProcessFunction,
    KeyedCoProcessFunction,
    KeyedProcessFunction,
    ListState,
    ListStateDescriptor,
    MapFunction,
    MapState,
    MapStateDescriptor,
    OutputTag,
    ProcessFunction,
    ProcessJoinFunction,
    ProcessWindowFunction,
    ReduceFunction,
    ReducingState,
    ReducingStateDescriptor,
    RuntimeContext,
    TimeWindow,
    ValueState,
    ValueStateDescriptor,
    WatermarkStrategy,
    WindowFunction,
)
from flink_release_1_16_0_spark.datastream.cep import CEP, Pattern, PatternStream
from flink_release_1_16_0_spark.datastream.stream import (
    AsyncDataStream,
    DataStream,
    EventTimeSessionWindows,
    KeyedStream,
    SlidingEventTimeWindows,
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
    WindowedStream,
)

__all__ = [name for name in dir() if not name.startswith("_")]
