"""TableDescriptor / Schema builder API.

Reference: ``TableDescriptor.java`` (flink-table-api-java/.../api/,
forConnector:63, Builder schema/option/format/partitionedBy/comment)
and ``Schema.java`` (api/Schema.java, newBuilder:95 — column,
columnByExpression, columnByMetadata, watermark, primaryKey), consumed
by ``TableEnvironment.createTable`` / ``createTemporaryTable`` /
``from(TableDescriptor)`` (TableEnvironmentImpl.java).

Lowering: the builders assemble the exact DDL the SQL path already
implements and execute it through ``TableEnvironment.execute_sql`` —
one schema/connector code path, programmatic or textual.
"""

from __future__ import annotations


class Schema:
    def __init__(self, parts: list[str]) -> None:
        self._parts = parts

    @staticmethod
    def new_builder() -> "SchemaBuilder":
        return SchemaBuilder()

    def to_ddl(self) -> str:
        return ",\n  ".join(self._parts)


class SchemaBuilder:
    def __init__(self) -> None:
        self._parts: list[str] = []

    def column(self, name: str, type_ddl: str) -> "SchemaBuilder":
        self._parts.append(f"{name} {type_ddl}")
        return self

    def column_by_expression(self, name: str, expr: str) -> "SchemaBuilder":
        """Computed column (Schema.columnByExpression)."""
        self._parts.append(f"{name} AS {expr}")
        return self

    def column_by_metadata(
        self,
        name: str,
        type_ddl: str,
        key: str | None = None,
        virtual: bool = False,
    ) -> "SchemaBuilder":
        part = f"{name} {type_ddl} METADATA"
        if key:
            part += f" FROM '{key}'"
        if virtual:
            part += " VIRTUAL"
        self._parts.append(part)
        return self

    def watermark(self, col: str, expr: str) -> "SchemaBuilder":
        self._parts.append(f"WATERMARK FOR {col} AS {expr}")
        return self

    def primary_key(self, *cols: str) -> "SchemaBuilder":
        self._parts.append(f"PRIMARY KEY ({', '.join(cols)}) NOT ENFORCED")
        return self

    def build(self) -> Schema:
        return Schema(list(self._parts))


class TableDescriptor:
    def __init__(
        self,
        connector: str,
        schema: Schema | None,
        options: dict[str, str],
        partition_keys: tuple[str, ...],
        comment: str | None,
    ) -> None:
        self.connector = connector
        self.schema = schema
        self.options = options
        self.partition_keys = partition_keys
        self.comment = comment

    @staticmethod
    def for_connector(connector: str) -> "TableDescriptorBuilder":
        return TableDescriptorBuilder(connector)

    def to_create_sql(self, path: str, temporary: bool = False) -> str:
        if self.schema is None:
            raise ValueError(f"table {path!r} needs a schema")
        def q(s: str) -> str:
            return s.replace("'", "''")

        opts = {"connector": self.connector, **self.options}
        with_clause = ", ".join(
            f"'{q(k)}' = '{q(v)}'" for k, v in opts.items()
        )
        sql = f"CREATE {'TEMPORARY ' if temporary else ''}TABLE {path} (\n  "
        sql += self.schema.to_ddl() + "\n)"
        if self.comment:
            sql += f" COMMENT '{q(self.comment)}'"
        if self.partition_keys:
            sql += f" PARTITIONED BY ({', '.join(self.partition_keys)})"
        sql += f" WITH ({with_clause})"
        return sql


class TableDescriptorBuilder:
    def __init__(self, connector: str) -> None:
        self._connector = connector
        self._schema: Schema | None = None
        self._options: dict[str, str] = {}
        self._partitions: tuple[str, ...] = ()
        self._comment: str | None = None

    def schema(self, schema: Schema) -> "TableDescriptorBuilder":
        self._schema = schema
        return self

    def option(self, key: str, value) -> "TableDescriptorBuilder":
        self._options[key] = str(value)
        return self

    def format(self, fmt: str) -> "TableDescriptorBuilder":
        self._options["format"] = fmt
        return self

    def partitioned_by(self, *cols: str) -> "TableDescriptorBuilder":
        self._partitions = cols
        return self

    def comment(self, comment: str) -> "TableDescriptorBuilder":
        self._comment = comment
        return self

    def build(self) -> TableDescriptor:
        return TableDescriptor(
            self._connector, self._schema, dict(self._options), self._partitions, self._comment
        )
