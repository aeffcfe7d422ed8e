// std::vector serialization is handled directly by the stub archives.
#ifndef BOOST_STUB_SERIALIZATION_VECTOR_HPP
#define BOOST_STUB_SERIALIZATION_VECTOR_HPP
#endif
