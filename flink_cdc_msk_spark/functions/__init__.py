from .java_hash import java_partition, java_string_hashcode

__all__ = ["java_string_hashcode", "java_partition"]
