"""Pipeline stages. Each module is one SURVEY §2 operator family."""
