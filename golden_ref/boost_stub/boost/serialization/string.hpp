// std::string serialization is handled directly by the stub archives.
#ifndef BOOST_STUB_SERIALIZATION_STRING_HPP
#define BOOST_STUB_SERIALIZATION_STRING_HPP
#endif
